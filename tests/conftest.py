import os

os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '')
    + ' --xla_force_host_platform_device_count=8'
)
import jax

# The container's sitecustomize force-registers the axon TPU plugin; tests
# always run on (virtual 8-device) CPU.
jax.config.update('jax_platforms', 'cpu')
