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
                 seed=0):
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

        self.params = None
        self.opt_state = None
        self.iteration = 0
        self.best_validation_loss = math.inf
        self._validation_ds = None
        self._tx = None
        self._update_fn = None
        self._writer = None

    # ------------------------------------------------------------------
    @property
    def checkpoint_dir(self):
        return self.storage_dir / 'checkpoints'

    def ensure_init(self):
        if self.params is None:
            self.params = self.model.init_params(
                jax.random.PRNGKey(self.seed))
        if self._tx is None:
            self._tx = self.optimizer.make(self.virtual_minibatch_size)
        if self.opt_state is None:
            self.opt_state = self._tx.init(self.params)
        if self._update_fn is None:
            model = self.model
            tx = self._tx

            def update(params, opt_state, batch, key):
                (loss, aux), grads = jax.value_and_grad(
                    model.loss_fn, has_aux=True)(params, batch, key, True)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = jax.tree_util.tree_map(
                    lambda p, u: p + u, params, updates)
                return params, opt_state, loss, aux

            self._update_fn = jax.jit(update, donate_argnums=(0, 1))

            def eval_loss(params, batch, key):
                return model.loss_fn(params, batch, key, False)

            self._eval_fn = jax.jit(eval_loss)

    @property
    def writer(self):
        if self._writer is None:
            self._writer = SummaryWriter(self.storage_dir)
        return self._writer

    # ------------------------------------------------------------------
    def register_validation_hook(self, validation_ds, max_checkpoints=None):
        self._validation_ds = validation_ds

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
            key, sub = jax.random.split(key)
            loss_sum, aux = self._eval_fn(self.params, arrays, sub)
            per_example = np.atleast_1d(np.asarray(aux['per_example_loss']))
            losses.extend(per_example.tolist())
            datasets = meta.get('dataset', ['validate'] * len(per_example))
            if isinstance(datasets, str):
                datasets = [datasets] * len(per_example)
            for ds_name, lv in zip(datasets, per_example):
                summary.add_scalar(f'{ds_name}_{self.model.loss.name}', lv)
                summary.add_histogram(
                    f'hist_{ds_name}_{self.model.loss.name}', lv)
            summary.add_to_loss(float(loss_sum))
        mean_loss = float(np.mean(losses)) if losses else math.inf
        return mean_loss, summary

    # ------------------------------------------------------------------
    def test_run(self, train_ds, validation_ds, deterministic_atol=1e-5,
                 deterministic_rtol=1e-5, loss_atol=1e10, loss_rtol=1e10,
                 virtual_minibatch_size=1):
        """Pre-flight: 2 examples through train (fwd+bwd) and validate,
        twice, with identical PRNG keys -> results must replicate exactly
        (our keys are explicit, so determinism actually holds)."""
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
                    key, sub = jax.random.split(key)
                    if training:
                        loss, gn = grad_norm(arrays, sub)
                        assert np.isfinite(loss), loss
                        assert np.isfinite(gn) and gn > 0, gn
                        rep.append((loss, gn))
                    else:
                        loss_sum, _aux = self._eval_fn(self.params, arrays, sub)
                        loss = float(loss_sum)
                        assert np.isfinite(loss), loss
                        rep.append((loss,))
            results.append(rep)
        for a, b in zip(*results):
            np.testing.assert_allclose(
                a, b, atol=deterministic_atol, rtol=deterministic_rtol,
                err_msg='test_run: non-deterministic loss/grad')
        return results[0]

    # ------------------------------------------------------------------
    def save(self, best=False):
        return ckpt_lib.save_checkpoint(
            self.checkpoint_dir, self.iteration, self.params,
            opt_state=self.opt_state,
            meta={'best_validation_loss': self.best_validation_loss},
            best=best)

    def load(self, path):
        self.ensure_init()
        params, opt_state, meta = ckpt_lib.load_checkpoint(
            path, params_template=self.params,
            opt_state_template=self.opt_state)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        if opt_state is not None:
            self.opt_state = opt_state
        self.iteration = int(meta.get('iteration', 0))
        self.best_validation_loss = float(
            meta.get('best_validation_loss', math.inf))

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
            for step_loss, per, datasets in pending:
                step_loss = float(step_loss)
                if not np.isfinite(step_loss):
                    raise RuntimeError(
                        f'Non-finite loss {step_loss} near iteration '
                        f'{self.iteration}')
                summary.add_to_loss(step_loss)
                for ds_name, lv in zip(datasets,
                                       np.atleast_1d(np.asarray(per))):
                    summary.add_scalar(
                        f'{ds_name}_{self.model.loss.name}', lv)
            pending = []

        while self.iteration < self.stop_trigger:
            for k in range(vmb):
                ex = next(data)
                arrays, meta = _array_part(ex)
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
                self.save(best=best)

        drain_pending()
        # Final checkpoint if the loop ended off-trigger
        if not (self.checkpoint_dir / f'ckpt_{self.iteration}.npz').exists():
            self.save()
        return self.iteration


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
