"""Training runtime: jitted step loop, triggers, validation hook, checkpoints.

Native equivalent of the padertorch ``pt.Trainer`` surface the reference
configures (``experiment.py:137-151``): Adam + gradient clipping, gradient
accumulation (``virtual_minibatch_size``), ``summary/checkpoint/stop``
triggers counted in iterations (= optimizer steps), a registered validation
hook that tracks the best loss, periodic checkpoints with latest/best links,
and a ``test_run`` pre-flight (2 examples through train+validate, repeated
and compared — deterministic here thanks to explicit PRNG keys, unlike the
reference which must max out its tolerances, ``experiment.py:281-290``).

The hot path is one jitted ``value_and_grad`` + optax update with donated
buffers; batches stream from the host pipeline.

Distributed training (new vs the reference, whose only multi-device line is
``torch.nn.DataParallel``, reference ``experiment.py:313-314``): pass
``mesh={'data': D, 'model': M}`` (``data=None`` -> all remaining devices) and
the Trainer trains SPMD over a ``jax.sharding.Mesh``:

- parameters are placed via ``dist.mesh.shard_params`` (replicated for pure
  data-parallel; gate-dim sharded over ``'model'`` when M>1),
- every batch is sharded over ``'data'`` (``dist.mesh.shard_batch``
  single-process, ``dist.multihost.global_batch_from_local`` multi-host),
- with the Pallas recurrence backend the step runs under ``shard_map``
  (each device executes the fused kernel on its local batch shard; grads
  are ``psum``-ed over ``'data'``); with the scan backend the step is plain
  ``jit`` and XLA's SPMD partitioner inserts the collectives,
- ``model>1`` forces the scan backend (the fused kernel is not
  partition-aware; XLA handles the sharded gate matmuls natively).
"""

from __future__ import annotations

import itertools
import math
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tssep_tpu.config.configurable import Configurable, from_config
from tssep_tpu.train import checkpoint as ckpt_lib
from tssep_tpu.train.optimizer import Adam
from tssep_tpu.train.summary import ReviewSummary, SummaryWriter

__all__ = ['Trainer', 'TriggerError']


class TriggerError(ValueError):
    pass


def _trigger(value):
    """Normalize ``(N, 'iteration')`` config form to int N."""
    if isinstance(value, (list, tuple)):
        n, unit = value
        if unit != 'iteration':
            raise TriggerError(f'Only iteration triggers supported: {value}')
        return int(n)
    return int(value)


class _ShardMapCaller:
    """jit(shard_map(step)) with per-batch-structure spec derivation.

    ``args = (*state, batch, key)``: state (params/opt) and key are
    replicated; every batch leaf with ndim>=1 is sharded over 'data' on its
    leading axis.  ``out_specs``: everything replicated except the last
    output (aux: per-example values), which is stitched over 'data'.
    The compiled callable is cached per batch tree structure.
    """

    def __init__(self, fn, mesh, n_state, n_replicated_out, donate=False,
                 key_sharded=False):
        self.fn = fn
        self.mesh = mesh
        self.n_state = n_state
        self.n_replicated_out = n_replicated_out
        self.donate = donate
        #: True: the trailing key operand is per-example keys (B, 2),
        #: sharded over 'data' like the batch.
        self.key_sharded = key_sharded
        self._cache = {}

    def __call__(self, *args):
        from jax.sharding import PartitionSpec as P
        from tssep_tpu.dist.mesh import DATA_AXIS
        shard_map = jax.shard_map
        batch = args[self.n_state]
        flat, treedef = jax.tree_util.tree_flatten(batch)
        specs = tuple(P(DATA_AXIS) if getattr(x, 'ndim', 0) >= 1 else P()
                      for x in flat)
        bspec = jax.tree_util.tree_unflatten(treedef, list(specs))
        # Key on the derived specs, not just the tree structure: a later
        # batch with identical structure but a leaf whose rank changed
        # (0-d vs >=1-d) must not reuse stale in_specs.
        cache_key = (treedef, specs)
        fn_c = self._cache.get(cache_key)
        if fn_c is None:
            in_specs = tuple([P()] * self.n_state) + (
                bspec, P(DATA_AXIS) if self.key_sharded else P())
            out_specs = tuple([P()] * self.n_replicated_out) + (P(DATA_AXIS),)
            mapped = shard_map(self.fn, mesh=self.mesh, in_specs=in_specs,
                               out_specs=out_specs, check_vma=False)
            fn_c = jax.jit(
                mapped,
                donate_argnums=tuple(range(self.n_state))
                if self.donate else ())
            self._cache[cache_key] = fn_c
        return fn_c(*args)


def _host_fetch(x):
    """Device value -> numpy, multi-host-safe: a data-sharded array spans
    non-addressable devices on a pod, where plain np.asarray raises; the
    process_allgather is a collective, safe here because every host runs
    the same trigger-synchronized logging code."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        # tiled=True: a GLOBAL (non-fully-addressable) array gathers into
        # its global value; tiled=False (stack-by-process) is only valid
        # for host-local inputs and raises here.
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _local_fetch(x):
    """Device value -> numpy holding only this host's addressable rows (in
    global index order).  Unlike ``_host_fetch`` this is NOT a collective:
    safe for host-local consumers (snapshots, per-example labeling) on a
    pod where the global array spans non-addressable devices."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        by_index = {}  # dedupe: replicated arrays repeat the same index
        for s in x.addressable_shards:
            by_index.setdefault(
                tuple(sl.start or 0 for sl in s.index), s)
        shards = [by_index[k] for k in sorted(by_index)]
        if len(shards) == 1:
            return np.asarray(shards[0].data)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(x)


def _fetch_complex_safe(tree):
    """Tree device->host fetch that splits complex leaves into re/im
    transfers: the axon-relay TPU runtime's D2H path raises UNIMPLEMENTED
    for complex64 (chip-verified round 3), while real transfers work."""
    def one(x):
        if not hasattr(x, 'dtype'):
            return x
        if jnp.issubdtype(x.dtype, jnp.complexfloating):
            return (np.asarray(jnp.real(x))
                    + 1j * np.asarray(jnp.imag(x)))
        return np.asarray(x)
    return jax.tree_util.tree_map(one, tree)


def _array_part(ex):
    """Split an example dict into (jit-able arrays, host-only meta)."""
    arrays, meta = {}, {}
    for k, v in ex.items():
        if hasattr(v, 'shape') and hasattr(v, 'dtype'):
            arrays[k] = v
        elif k == 'reference_channel':
            arrays[k] = v
        else:
            meta[k] = v
    return arrays, meta


class Trainer(Configurable):
    def __init__(self, model, storage_dir, optimizer=None, loss_weights=None,
                 summary_trigger=(1000, 'iteration'),
                 checkpoint_trigger=(1000, 'iteration'),
                 stop_trigger=(416666, 'iteration'),
                 virtual_minibatch_size=1,
                 seed=0, mesh=None, create_snapshots=True,
                 async_checkpoints=False, early_stop_patience=0):
        if isinstance(model, dict):
            model = from_config(model)
        if optimizer is None:
            optimizer = Adam()
        elif isinstance(optimizer, dict):
            optimizer = from_config(optimizer)
        self.model = model
        self.storage_dir = Path(storage_dir) if storage_dir else Path('.')
        self.optimizer = optimizer
        self.loss_weights = loss_weights
        self.summary_trigger = _trigger(summary_trigger)
        self.checkpoint_trigger = _trigger(checkpoint_trigger)
        self.stop_trigger = _trigger(stop_trigger)
        self.virtual_minibatch_size = int(virtual_minibatch_size)
        self.seed = seed
        #: Emit audio/spectrogram/mask-image payloads at summary and
        #: validation triggers (reference ``model.py:692-752``).
        self.create_snapshots = bool(create_snapshots)
        #: Overlap checkpoint serialization/IO with training (device->host
        #: fetch stays synchronous; see train/checkpoint.py _AsyncWriter —
        #: the Orbax-async idea on the npz format).
        self.async_checkpoints = bool(async_checkpoints)
        #: None (single device) or {'data': D|None, 'model': M}.
        self.mesh_config = dict(mesh) if mesh else None
        #: >0: stop training after this many consecutive validations
        #: without a new best validation loss.  The decision is derived
        #: from the collective validation loss, so it is identical on
        #: every host (no divergent control flow under multi-host).
        self.early_stop_patience = int(early_stop_patience)
        self._validations_since_best = 0

        self.params = None
        self.opt_state = None
        self.iteration = 0
        self.best_validation_loss = math.inf
        self._validation_ds = None
        self.max_checkpoints = None
        self._tx = None
        self._update_fn = None
        self._writer = None
        self._snap_fn = None
        self.mesh = None
        self._use_shard_map = False

    # ------------------------------------------------------------------
    @property
    def checkpoint_dir(self):
        return self.storage_dir / 'checkpoints'

    @property
    def data_parallel_size(self):
        """Batch-divisibility requirement imposed by the mesh (1 if none)."""
        if self.mesh_config is None:
            return 1
        self._ensure_mesh()
        from tssep_tpu.dist.mesh import DATA_AXIS
        return self.mesh.shape[DATA_AXIS]

    def _ensure_mesh(self):
        if self.mesh_config is None or self.mesh is not None:
            return
        from tssep_tpu.dist import mesh as mesh_lib
        from tssep_tpu.nn import rnnp
        model_par = int(self.mesh_config.get('model', 1) or 1)
        data_par = self.mesh_config.get('data')
        n_devices = (None if data_par in (None, -1, 'all')
                     else int(data_par) * model_par)
        self.mesh = mesh_lib.make_mesh(n_devices, model_parallel=model_par)
        impl = rnnp._resolve_impl(rnnp.DEFAULT_IMPL)
        if model_par > 1 and impl == 'pallas':
            # The fused kernel operates on unsharded (batch-local) operands;
            # under tensor parallelism XLA must partition the gate matmuls,
            # which only the scan path expresses in partitionable HLO.
            rnnp.force_impl('scan')
            impl = 'scan'
        self._use_shard_map = (
            impl == 'pallas'
            or bool(self.mesh_config.get('shard_map', False)))
        if self._use_shard_map and model_par > 1:
            raise ValueError(
                'shard_map path is data-parallel only (model axis must be 1)')

    def _place_batch(self, arrays):
        """Device placement for one batch (mesh-sharded when configured)."""
        if self.mesh is None:
            return arrays
        from tssep_tpu.dist import multihost
        from tssep_tpu.dist.mesh import shard_batch, DATA_AXIS
        multi = multihost.is_initialized() and jax.process_count() > 1
        # Each process holds its LOCAL batch here; the divisibility
        # requirement is per-process (local batch % local data devices),
        # equivalently global batch % global data axis.
        data_size = self.mesh.shape[DATA_AXIS]
        if multi:
            data_size = max(1, data_size // jax.process_count())
        for k, v in arrays.items():
            if hasattr(v, 'ndim') and v.ndim >= 1 \
                    and v.shape[0] % data_size != 0:
                raise ValueError(
                    f'Batch axis of {k!r} ({v.shape[0]}) must be divisible '
                    f'by the {"per-process share of the " if multi else ""}'
                    f'mesh data axis ({data_size}); adjust '
                    f'train/validation batch size.')
        if multi:
            return multihost.global_batch_from_local(arrays, self.mesh)
        return shard_batch(arrays, self.mesh)

    def ensure_init(self):
        self._ensure_mesh()
        if self.loss_weights:
            # padertorch ``Trainer(loss_weights=...)`` equivalent: map the
            # component weights onto the joint loss' weight attributes.
            loss = self.model.loss
            for name, w in dict(self.loss_weights).items():
                attr = f'{name}_weight'
                if not hasattr(loss, attr):
                    raise ValueError(
                        f'loss_weights key {name!r} has no matching '
                        f'{attr!r} on {type(loss).__name__}')
                setattr(loss, attr, float(w))
            self.loss_weights = None
        if self.params is None:
            self.params = self.model.init_params(
                jax.random.PRNGKey(self.seed))
            if self.mesh is not None:
                from tssep_tpu.dist.mesh import shard_params
                self.params = shard_params(self.params, self.mesh)
        if self._tx is None:
            self._tx = self.optimizer.make(self.virtual_minibatch_size)
        if self.opt_state is None:
            # Under a mesh, jit propagates the param shardings to the state;
            # leaves born inside init (e.g. the step counter) come out on a
            # single device and are re-placed replicated over the mesh.
            if self.mesh is not None:
                from jax.sharding import (
                    NamedSharding, PartitionSpec, SingleDeviceSharding)
                opt_state = jax.jit(self._tx.init)(self.params)
                replicated = NamedSharding(self.mesh, PartitionSpec())
                self.opt_state = jax.tree_util.tree_map(
                    lambda x: (jax.device_put(x, replicated)
                               if isinstance(getattr(x, 'sharding', None),
                                             SingleDeviceSharding) else x),
                    opt_state)
            else:
                self.opt_state = self._tx.init(self.params)
        if self._update_fn is None:
            model = self.model
            tx = self._tx

            if self._use_shard_map:
                from tssep_tpu.dist.mesh import DATA_AXIS

                def sharded_update(params, opt_state, batch, key):
                    (loss, aux), grads = jax.value_and_grad(
                        model.loss_fn, has_aux=True)(
                        params, batch, key, True)
                    grads = jax.lax.psum(grads, DATA_AXIS)
                    loss = jax.lax.psum(loss, DATA_AXIS)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = jax.tree_util.tree_map(
                        lambda p, u: p + u, params, updates)
                    return params, opt_state, loss, aux['per_example_loss']

                def sharded_eval(params, batch, key):
                    loss, aux = model.loss_fn(params, batch, key, False)
                    return (jax.lax.psum(loss, DATA_AXIS),
                            aux['per_example_loss'])

                _update = _ShardMapCaller(sharded_update, self.mesh,
                                          n_state=2, n_replicated_out=3,
                                          donate=True, key_sharded=True)
                _eval = _ShardMapCaller(sharded_eval, self.mesh,
                                        n_state=1, n_replicated_out=1,
                                        key_sharded=True)

                def _batched_keys(batch, key):
                    # Pre-split per-example keys OUTSIDE the shard so each
                    # shard works on its slice of split(key, B_global) —
                    # per-example RNG identical to jit-SPMD / single-device
                    # (an in-shard split(key, B_local) would duplicate
                    # draws across shards).
                    b_global = next(v.shape[0] for v in batch.values()
                                    if getattr(v, 'ndim', 0) >= 1)
                    return jax.random.split(key, b_global)

                self._update_fn = lambda p, o, b, k: (
                    lambda r: (r[0], r[1], r[2],
                               {'per_example_loss': r[3]}))(
                    _update(p, o, b, _batched_keys(b, k)))
                self._eval_fn = lambda p, b, k: (
                    lambda r: (r[0], {'per_example_loss': r[1]}))(
                    _eval(p, b, _batched_keys(b, k)))
            else:
                def update(params, opt_state, batch, key):
                    (loss, aux), grads = jax.value_and_grad(
                        model.loss_fn, has_aux=True)(params, batch, key, True)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = jax.tree_util.tree_map(
                        lambda p, u: p + u, params, updates)
                    return params, opt_state, loss, aux

                def eval_loss(params, batch, key):
                    return model.loss_fn(params, batch, key, False)

                self._update_fn = jax.jit(update, donate_argnums=(0, 1))
                self._eval_fn = jax.jit(eval_loss)

    @property
    def writer(self):
        if self._writer is None:
            self._writer = SummaryWriter(self.storage_dir)
        return self._writer

    # ------------------------------------------------------------------
    def _add_snapshots(self, arrays, summary, key, strict=False):
        """Run one snapshot forward (forward + istft, no grad) on a batch
        and push audio/image payloads into ``summary`` (reference
        ``model.py:692-752``).  Failures are loud-but-nonfatal in the
        training loop (recorded as a scalar, never silently dropped);
        ``strict=True`` (the test_run pre-flight) re-raises so a
        permanently broken snapshot path fails at minute 0, not as a
        counter nobody alerts on at hour 30."""
        if not self.create_snapshots or not hasattr(self.model,
                                                    'add_snapshots'):
            return
        model = self.model
        if self._snap_fn is None:
            def snap_forward(params, batch, key):
                out = model.forward(params, batch, rng=key, training=False)
                if (out.stft_estimate is not None and 'observation' in batch
                        and hasattr(model.fe, 'istft')):
                    out.time_estimate = model.fe.istft(
                        out.stft_estimate,
                        num_samples=batch['observation'].shape[-1])
                return out
            self._snap_fn = jax.jit(snap_forward)
        try:
            if self.mesh is not None:
                # Snapshots picture one example; run unsharded on the
                # default device from host copies.  _local_fetch (not
                # np.asarray): on a pod the batch spans non-addressable
                # devices and a plain host copy would raise.
                host = {k: _local_fetch(v) if hasattr(v, 'shape') else v
                        for k, v in arrays.items()}
                out = self._snap_fn(jax.device_get(self.params), host, key)
                # host copies, not `arrays`: on a pod the raw batch spans
                # non-addressable devices and add_snapshots' np.asarray
                # would raise (caught by tests/test_multihost.py).
                model.add_snapshots(host, _fetch_complex_safe(out), summary)
            else:
                out = self._snap_fn(self.params, arrays, key)
                model.add_snapshots(arrays, _fetch_complex_safe(out),
                                    summary)
        except Exception as e:  # noqa: BLE001 - observability must not kill training
            if strict:
                raise
            summary.add_scalar('snapshot_errors', 1.0)
            print(f'snapshot failed: {e!r}')

    # ------------------------------------------------------------------
    def register_validation_hook(self, validation_ds, max_checkpoints=None):
        self._validation_ds = validation_ds
        #: Retention policy: keep at most this many ``ckpt_<it>.npz`` files
        #: (the best/latest symlink targets are always kept; ``None`` keeps
        #: all — reference checkpoint bookkeeping, ``experiment.py:224``).
        self.max_checkpoints = max_checkpoints

    def _prune_checkpoints(self):
        limit = getattr(self, 'max_checkpoints', None)
        if not limit:
            return
        keep = set()
        for link in ('ckpt_latest.npz', 'ckpt_best_loss.npz'):
            p = self.checkpoint_dir / link
            if p.is_symlink() or p.exists():
                keep.add(p.resolve().name)
        numbered = sorted(
            (p for p in self.checkpoint_dir.glob('ckpt_*.npz')
             if p.stem.split('_')[-1].isdigit()),
            key=lambda p: int(p.stem.split('_')[-1]))
        for p in numbered[:-limit]:
            if p.name not in keep:
                p.unlink()

    def validate(self, rng_key=None):
        """Full pass over the validation set; returns mean loss."""
        assert self._validation_ds is not None
        self.ensure_init()
        key = rng_key if rng_key is not None else jax.random.PRNGKey(
            self.seed + 1)
        summary = ReviewSummary()
        losses = []
        for i, ex in enumerate(self._validation_ds):
            arrays, meta = _array_part(ex)
            arrays = self._place_batch(arrays)
            key, sub = jax.random.split(key)
            if i == 0:
                # Rich snapshots (audio, spectrograms, masks w/ VAD
                # overlay) for the first validation batch.
                self._add_snapshots(arrays, summary, sub)
            loss_sum, aux = self._eval_fn(self.params, arrays, sub)
            # Global gather for the mean: every host must agree on the
            # validation loss (best-checkpoint decisions are collective).
            per_example = np.atleast_1d(_host_fetch(aux['per_example_loss']))
            losses.extend(per_example.tolist())
            # Per-dataset labeling uses only this host's rows:
            # meta['dataset'] holds local example names, so zipping the
            # globally gathered losses would mislabel them on a pod.
            per_local = np.atleast_1d(_local_fetch(aux['per_example_loss']))
            datasets = meta.get('dataset', ['validate'] * len(per_local))
            if isinstance(datasets, str):
                datasets = [datasets] * len(per_local)
            for ds_name, lv in zip(datasets, per_local):
                summary.add_scalar(f'{ds_name}_{self.model.loss.name}', lv)
                summary.add_histogram(
                    f'hist_{ds_name}_{self.model.loss.name}', lv)
            summary.add_to_loss(float(loss_sum))
        if not losses:
            raise RuntimeError(
                'Validation dataset yielded no batches — with drop_last '
                'under a mesh this happens when the validation set is '
                'smaller than the (per-host) validation batch size; '
                'shrink validation_batchsize or grow the validation set.')
        return float(np.mean(losses)), summary

    # ------------------------------------------------------------------
    def test_run(self, train_ds, validation_ds, deterministic_atol=1e-5,
                 deterministic_rtol=1e-5, loss_atol=1e-5, loss_rtol=1e-5,
                 virtual_minibatch_size=1):
        """Pre-flight: 2 examples through train (fwd+bwd) and validate,
        twice, with identical PRNG keys -> results must replicate
        (our keys are explicit, so determinism actually holds; the
        reference must max out its tolerances, ``experiment.py:281-290``).

        ``deterministic_atol/rtol`` bound the grad-norm replication,
        ``loss_atol/rtol`` the loss replication (separate knobs as in the
        reference's padertorch ``test_run`` signature)."""
        self.ensure_init()
        model = self.model

        def grad_norm(batch, key):
            (loss, _), grads = jax.value_and_grad(
                model.loss_fn, has_aux=True)(self.params, batch, key, True)
            gn = jax.tree_util.tree_reduce(
                lambda a, g: a + jnp.sum(jnp.square(g)), grads, 0.0)
            return float(loss), float(jnp.sqrt(gn))

        results = []
        for repetition in range(2):
            rep = []
            key = jax.random.PRNGKey(self.seed + 123)
            for ds, training in ((train_ds, True), (validation_ds, False)):
                for ex in itertools.islice(iter(ds), 2):
                    arrays, _ = _array_part(ex)
                    arrays = self._place_batch(arrays)
                    key, sub = jax.random.split(key)
                    if training:
                        loss, gn = grad_norm(arrays, sub)
                        assert np.isfinite(loss), loss
                        assert np.isfinite(gn) and gn > 0, gn
                        rep.append((loss, gn))
                    else:
                        if repetition == 0 and len(rep) == 2 \
                                and self.create_snapshots:
                            # Pre-flight the snapshot path strictly on the
                            # first validation batch: a broken snapshot
                            # must fail here, not degrade silently later.
                            self._add_snapshots(arrays, ReviewSummary(),
                                                sub, strict=True)
                        loss_sum, _aux = self._eval_fn(self.params, arrays, sub)
                        loss = float(loss_sum)
                        assert np.isfinite(loss), loss
                        rep.append((loss,))
            results.append(rep)
        for a, b in zip(*results):
            np.testing.assert_allclose(
                a[0], b[0], atol=min(loss_atol, 1e30),
                rtol=min(loss_rtol, 1e30),
                err_msg='test_run: non-replicating loss')
            if len(a) > 1:
                np.testing.assert_allclose(
                    a[1], b[1], atol=deterministic_atol,
                    rtol=deterministic_rtol,
                    err_msg='test_run: non-deterministic gradient')
        return results[0]

    # ------------------------------------------------------------------
    def save(self, best=False):
        # Multi-host: EVERY process must run the host-gather (the
        # process_allgather inside params_to_named is a collective — an
        # early return on non-zero hosts would deadlock host 0); only
        # process 0 touches the disk (write=False skips IO after the
        # gather).
        path = ckpt_lib.save_checkpoint(
            self.checkpoint_dir, self.iteration, self.params,
            opt_state=self.opt_state,
            meta={'best_validation_loss': self.best_validation_loss,
                  'validations_since_best': self._validations_since_best},
            best=best, async_write=self.async_checkpoints,
            write=jax.process_index() == 0,
            after_write=self._prune_checkpoints)
        if not self.async_checkpoints and jax.process_index() == 0:
            self._prune_checkpoints()
        return path

    def load(self, path):
        ckpt_lib.wait_for_pending()
        self.ensure_init()
        params, opt_state, meta = ckpt_lib.load_checkpoint(
            path, params_template=self.params,
            opt_state_template=self.opt_state)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        if self.mesh is not None:
            from tssep_tpu.dist.mesh import shard_params
            self.params = shard_params(self.params, self.mesh)
        if opt_state is not None:
            if self.mesh is not None and self.opt_state is not None:
                # Re-place each restored leaf with the sharding its
                # freshly-initialized counterpart had (jit(tx.init) above).
                opt_state = jax.tree_util.tree_map(
                    lambda new, old: (jax.device_put(new, old.sharding)
                                      if isinstance(old, jax.Array) else new),
                    opt_state, self.opt_state)
            self.opt_state = opt_state
        self.iteration = int(meta.get('iteration', 0))
        self.best_validation_loss = float(
            meta.get('best_validation_loss', math.inf))
        # Restore the early-stop patience counter alongside the best loss:
        # a resumed plateaued run would otherwise reset patience to 0 and
        # fire up to `patience` validations late after every resume.
        self._validations_since_best = int(
            meta.get('validations_since_best', 0))

    # ------------------------------------------------------------------
    def train(self, train_ds, device=None, resume=False):
        self.ensure_init()
        if resume:
            latest = ckpt_lib.latest_checkpoint(self.checkpoint_dir)
            if latest is not None:
                self.load(latest)

        vmb = self.virtual_minibatch_size
        data = iter(train_ds.tile(None)) if hasattr(train_ds, 'tile') \
            else itertools.cycle(train_ds)
        summary = ReviewSummary()
        t_start = time.time()
        examples_seen = 0
        # Device values are collected lazily and synced only at summary/
        # checkpoint boundaries — a per-step host sync would serialize the
        # dispatch pipeline (expensive on high-latency runtimes).
        pending = []

        def drain_pending():
            nonlocal pending
            if not pending:
                return
            # Batch the whole window into two host transfers: on relay-
            # style runtimes every device->host fetch is a full round
            # trip, so fetching each step's loss + per-example vector
            # individually costs O(window) round trips (~2 x trigger
            # interval transfers per summary).
            losses_h = pers_h = None
            try:
                losses_h = np.asarray(_host_fetch(
                    jnp.stack([p[0] for p in pending])))
                pers_h = np.asarray(_host_fetch(
                    jnp.stack([jnp.atleast_1d(p[1]) for p in pending])))
            except Exception:  # noqa: BLE001 - ragged shapes etc.
                pass
            for i, (step_loss, per, datasets) in enumerate(pending):
                if losses_h is not None:
                    step_loss, per = losses_h[i], pers_h[i]
                else:
                    per = _host_fetch(per)
                step_loss = float(step_loss)
                if not np.isfinite(step_loss):
                    raise RuntimeError(
                        f'Non-finite loss {step_loss} near iteration '
                        f'{self.iteration}')
                summary.add_to_loss(step_loss)
                for ds_name, lv in zip(datasets, np.atleast_1d(per)):
                    summary.add_scalar(
                        f'{ds_name}_{self.model.loss.name}', lv)
            pending = []

        last_saved = self.iteration if self.iteration else -1
        while self.iteration < self.stop_trigger:
            for k in range(vmb):
                ex = next(data)
                arrays, meta = _array_part(ex)
                arrays = self._place_batch(arrays)
                key = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                       self.iteration), k)
                self.params, self.opt_state, loss, aux = self._update_fn(
                    self.params, self.opt_state, arrays, key)
                per = aux['per_example_loss']
                n = int(np.prod(per.shape)) if hasattr(per, 'shape') else 1
                examples_seen += max(n, 1)
                datasets = meta.get('dataset', ['train'] * max(n, 1))
                if isinstance(datasets, str):
                    datasets = [datasets] * max(n, 1)
                pending.append((loss, per, datasets))
            self.iteration += 1

            if self.iteration % self.summary_trigger == 0:
                drain_pending()
                elapsed = time.time() - t_start
                summary.add_scalar('examples_per_second',
                                   examples_seen / max(elapsed, 1e-9))
                # Rich snapshots of the last training batch (reference
                # gates the same payloads on create_snapshot at summary
                # intervals, model.py:692-752).
                self._add_snapshots(arrays, summary, key)
                self.writer.flush(summary, self.iteration, prefix='train/')
                summary = ReviewSummary()

            if (self.iteration % self.checkpoint_trigger == 0
                    or self.iteration >= self.stop_trigger):
                drain_pending()
                best = False
                if self._validation_ds is not None:
                    val_loss, val_summary = self.validate()
                    self.writer.flush(val_summary, self.iteration,
                                      prefix='validation/')
                    self.writer.scalar('validation/mean_loss', val_loss,
                                       self.iteration)
                    if val_loss < self.best_validation_loss:
                        self.best_validation_loss = val_loss
                        best = True
                        self._validations_since_best = 0
                    else:
                        self._validations_since_best += 1
                self.save(best=best)
                last_saved = self.iteration
                if (self.early_stop_patience
                        and self._validations_since_best
                        >= self.early_stop_patience):
                    print(f'Early stop at iteration {self.iteration}: no '
                          f'validation improvement for '
                          f'{self._validations_since_best} validations '
                          f'(best {self.best_validation_loss:.6g})')
                    break

        drain_pending()
        ckpt_lib.wait_for_pending()
        # Final checkpoint if the loop ended off-trigger.  The decision is
        # iteration bookkeeping, NOT a file-exists check: it must be the
        # same on every host (save() enters a collective gather).
        if last_saved != self.iteration:
            self.save()
            ckpt_lib.wait_for_pending()
        self.close()
        return self.iteration

    def close(self):
        """Release host-side resources (tfevents writer thread + queue
        fds).  Without this every Trainer leaks a tensorboardX event
        writer — enough accumulated leaks abort XLA's CPU compiler
        (thread/fd exhaustion; reproduced at ~190 trainers in one
        process).  Idempotent; the writer reopens lazily (append mode)
        if training resumes on the same Trainer."""
        if self._writer is not None:
            try:
                self._writer.close()
            finally:
                self._writer = None


class profile_trace:
    """Context manager: capture a jax.profiler trace when TSSEP_PROFILE is
    set (or a dir is passed); view with tensorboard or xprof."""

    def __init__(self, logdir=None):
        import os
        self.logdir = logdir or os.environ.get('TSSEP_PROFILE')

    def __enter__(self):
        if self.logdir:
            jax.profiler.start_trace(str(self.logdir))
        return self

    def __exit__(self, *exc):
        if self.logdir:
            jax.profiler.stop_trace()
        return False
