"""Device mesh + sharding rules.

The reference has no distributed backend at all (single-process
``torch.nn.DataParallel`` only, reference ``experiment.py:313-314``); this
layer is new, designed mesh-first per the TPU scaling recipe:

- a 2-D ``('data', 'model')`` mesh over the slice;
- batches sharded over ``'data'`` (gradients all-reduced by XLA over ICI);
- the BLSTM gate matrices (the only tensors that can exceed a chip when the
  trunk is scaled up) sharded over ``'model'`` along the 4H gate dim;
- everything expressed as ``NamedSharding`` trees: the SPMD partitioner
  inserts the collectives, no hand-written NCCL-style code.

Scope of tensor parallelism ('model' > 1) — explicit, so nobody ships it
by accident:

- It is a **memory-scaling capability**, numerically equivalent to the
  single-device trajectory (``tests/test_dist_train.py::
  test_tp_mesh_matches_single_device``) and integrated end-to-end
  (checkpoint/resume on the mesh).
- It is **not the recommended performance mesh for the flagship model**
  (~11M params, fits any single chip many times over): under gate-dim
  sharding the per-step gate slices ``gates[..., k*H:(k+1)*H]`` force
  resharding collectives inside the scan, the per-chip matmuls shrink
  below good MXU tile sizes, and the fused Pallas recurrence kernel is
  fenced to the scan path (``train/trainer.py``).  Use ``model=1`` and
  scale over 'data' (+ segment-parallel eval) unless the trunk itself has
  outgrown a chip's HBM.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'param_shardings', 'batch_shardings', 'shard_params',
           'shard_batch', 'DATA_AXIS', 'MODEL_AXIS']

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(n_devices=None, model_parallel=1, devices=None) -> Mesh:
    """Create a ('data', 'model') mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    assert n_devices % model_parallel == 0, (n_devices, model_parallel)
    grid = np.array(devices).reshape(n_devices // model_parallel,
                                     model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _param_spec(name: str, shape, model_size: int) -> P:
    """Sharding rule for one parameter, keyed on its dotted name."""
    if len(shape) == 0:
        return P()
    # LSTM gate matrices / biases: first dim is 4H -> shard over 'model'
    if 'weight_ih' in name or 'weight_hh' in name:
        if shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)
        return P()
    if 'bias_ih' in name or 'bias_hh' in name:
        if shape[0] % model_size == 0:
            return P(MODEL_AXIS)
        return P()
    # Projection / head linears: shard the output dim when large & divisible
    if name.endswith('.weight') and len(shape) == 2:
        if shape[0] >= 2 * model_size and shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)
        return P()
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree for a param pytree (by dotted leaf name)."""
    from tssep_tpu.train.checkpoint import _path_str
    model_size = mesh.shape[MODEL_AXIS]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    specs = []
    for path, leaf in flat:
        name = _path_str(path)
        spec = (_param_spec(name, leaf.shape, model_size)
                if model_size > 1 else P())
        specs.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def batch_shardings(batch, mesh: Mesh):
    """Shard the leading (batch) dim of every array over 'data'."""
    def spec(leaf):
        if hasattr(leaf, 'ndim') and leaf.ndim >= 1:
            return NamedSharding(
                mesh, P(DATA_AXIS, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map(spec, batch)


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_shardings(batch, mesh))
