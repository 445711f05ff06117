"""Multi-host runtime: distributed init + per-host data feeding.

The reference is strictly single-process (``torch.nn.DataParallel``,
reference ``experiment.py:313-314``); this layer scales the same training
across a TPU pod slice:

- ``initialize()`` wraps ``jax.distributed.initialize`` (env-driven on TPU
  pods: coordinator and process ids come from the TPU metadata);
- each host's input pipeline yields its *local* batch shard;
  ``global_batch_from_local`` assembles the global sharded array
  (``jax.make_array_from_process_local_data``) over a mesh whose 'data'
  axis spans all hosts — gradients all-reduce over ICI/DCN automatically
  inside the jitted step;
- ``host_shard_dataset`` deals examples round-robin by process index with a
  deterministic epoch seed, so the effective global batch and shuffling
  semantics match single-host training.
"""

from __future__ import annotations

import jax
import numpy as np

from tssep_tpu.dist.mesh import batch_shardings

__all__ = ['initialize', 'is_initialized', 'process_count', 'process_index',
           'global_batch_from_local', 'host_shard_dataset']

_initialized = False


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the multi-host runtime (no-op when single-process)."""
    global _initialized
    if _initialized:
        return
    if num_processes is None and coordinator_address is None:
        # TPU-pod auto-configuration.  ``TSSEP_MULTIHOST=1`` forces the
        # attempt (covers pods whose auto-detection lives in the TPU
        # metadata/libtpu rather than these env vars); ``=0`` forces
        # single-process.  Otherwise attempt when a rendezvous-ish
        # environment is visible.  If a pod environment WAS detected, an
        # init failure raises — silently downgrading a pod slice to N
        # independent single-process runs produces wrong results with no
        # error.
        import os
        force = os.environ.get('TSSEP_MULTIHOST')
        if force == '0':
            _initialized = True
            return
        pod_env = any(v in os.environ for v in (
            'JAX_COORDINATOR_ADDRESS', 'COORDINATOR_ADDRESS',
            'MEGASCALE_COORDINATOR_ADDRESS', 'MEGASCALE_NUM_SLICES',
            'TPU_PROCESS_BOUNDS'))
        # TPU_WORKER_HOSTNAMES with >1 entry implies a pod slice.
        hostnames = os.environ.get('TPU_WORKER_HOSTNAMES', '')
        pod_env = pod_env or len([h for h in hostnames.split(',') if h]) > 1
        if force == '1' or pod_env:
            jax.distributed.initialize()   # failures raise — loud by design
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    _initialized = True


def is_initialized():
    return _initialized


def process_count():
    return jax.process_count()


def process_index():
    return jax.process_index()


def global_batch_from_local(local_batch: dict, mesh):
    """Assemble a globally-sharded batch from this host's local arrays.

    ``local_batch``: this process's share (leading dim = local batch).  The
    result's leading dim is the global batch, sharded over 'data'.
    """
    shardings = batch_shardings(local_batch, mesh)

    def assemble(x, sharding):
        if not hasattr(x, 'ndim') or x.ndim == 0:
            return x
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree_util.tree_map(assemble, local_batch, shardings)


def host_shard_dataset(ds, n_processes=None, index=None, equalize=True):
    """Deal examples round-robin to processes (deterministic order).

    ``equalize`` truncates every host's share to ``floor(N / n)`` examples
    (the ragged tail is dropped on all hosts).  This is load-bearing for
    finite datasets: the sharded training/validation loops run one
    collective per batch, so hosts MUST see identical batch counts — a
    host with one extra example would issue a collective the others never
    join (deadlock).
    """
    if n_processes is None:
        n_processes = process_count()
    if index is None:
        index = process_index()
    if n_processes == 1:
        return ds

    from tssep_tpu.data.pipeline import Dataset

    class _Sharded(Dataset):
        def __init__(self, inner):
            self.inner = inner

        def __iter__(self):
            limit = None
            if equalize:
                try:
                    limit = len(self.inner) // n_processes
                except TypeError:
                    limit = None          # unsized stream: no tail to trim
            n_yielded = 0
            for i, ex in enumerate(self.inner):
                if i % n_processes == index:
                    if limit is not None and n_yielded >= limit:
                        break
                    n_yielded += 1
                    yield ex

        def __len__(self):
            n = len(self.inner)
            if equalize:
                return n // n_processes
            return n // n_processes + (1 if n % n_processes > index else 0)

        def __repr__(self):
            return (f'HostShardDataset({index}/{n_processes}, '
                    f'equalize={equalize})\n'
                    f'  {self.inner!r}')

    return _Sharded(ds)
