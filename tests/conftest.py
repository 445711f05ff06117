import os

os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '')
    + ' --xla_force_host_platform_device_count=8'
)
import jax
import pytest

# The container's sitecustomize force-registers the axon TPU plugin; tests
# always run on (virtual 8-device) CPU.
jax.config.update('jax_platforms', 'cpu')


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The suite jit-compiles hundreds of distinct programs; keeping every
    LLVM-JIT'd executable alive exhausts process resources (observed as
    XLA CPU compile SIGABRT/SIGSEGV ~200 tests in once the suite grew
    past round 2's size).  Per-module clearing bounds the accumulation
    while keeping within-module caching."""
    yield
    jax.clear_caches()
