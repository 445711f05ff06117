"""Experiment/session orchestration (reference ``tssep/train/experiment.py``):
resume detection, warm start, pre-flight test run, validation hook
registration, log-file artifacts, then the trainer loop."""

from __future__ import annotations

from pathlib import Path

from tssep_tpu.config.configurable import Configurable, from_config
from tssep_tpu.tasks.model import Model
from tssep_tpu.train.init_ckpt import InitCheckPoint
from tssep_tpu.train.trainer import Trainer
from tssep_tpu.train.optimizer import Adam

__all__ = ['Experiment']


class Experiment(Configurable):
    @classmethod
    def finalize_dogmatic_config(cls, config):
        virtual_minibatch_size = 12
        config['trainer'] = {
            'factory': Trainer,
            'model': {'factory': Model},
            'summary_trigger': [1000 // virtual_minibatch_size, 'iteration'],
            'checkpoint_trigger': [12000 // virtual_minibatch_size, 'iteration'],
            'stop_trigger': [5_000_000 // virtual_minibatch_size, 'iteration'],
            'virtual_minibatch_size': virtual_minibatch_size,
            'optimizer': {'factory': Adam, 'gradient_clipping': 10},
            'mesh': None,
        }
        config['init_ckpt'] = {'factory': InitCheckPoint}

    def __init__(self, trainer, train_batchsize=None,
                 validation_batchsize=None, init_ckpt=None,
                 init_ckpt_strict=True, cache_datasets_on_device=False,
                 max_checkpoints=None):
        #: Materialize the train/validation batches on the device once and
        #: cycle them (only batch ORDER reshuffles).  TPU-idiomatic for
        #: corpora that fit in HBM, and essential on hosts with slow
        #: host->device links.
        self.cache_datasets_on_device = cache_datasets_on_device
        if isinstance(trainer, dict):
            trainer = from_config(trainer)
        if isinstance(init_ckpt, dict):
            init_ckpt = from_config(init_ckpt)
        self.trainer: Trainer = trainer
        self.train_batchsize = train_batchsize
        self.validation_batchsize = validation_batchsize
        self.init_ckpt = init_ckpt if init_ckpt is not None else InitCheckPoint()
        self.init_ckpt_strict = init_ckpt_strict
        #: Checkpoint retention: keep at most this many numbered
        #: ``ckpt_<it>.npz`` (best/latest always kept); None keeps all.
        self.max_checkpoints = max_checkpoints

    def load_model_state_dict(self, ckpt, strict=True):
        return InitCheckPoint(init_ckpt=str(ckpt),
                              strict=strict).load_model_state_dict(self, ckpt)

    def add_log_files(self, **kwargs):
        log_dir = self.trainer.storage_dir / 'log'
        log_dir.mkdir(exist_ok=True, parents=True)
        (log_dir / 'experiment.txt').write_text(repr(self))
        model = self.trainer.model
        (log_dir / 'model.txt').write_text(
            f'{type(model).__name__}\n'
            f'  fe: {model.fe!r}\n'
            f'  mask_estimator params: {model.num_params():_}\n'
            f'  enhancer: {model.enhancer.name}\n'
            f'  loss: {model.loss.name}(target={model.loss.target!r})\n')
        for k, v in kwargs.items():
            (log_dir / f'{k}.txt').write_text(str(v))

    def train(self):
        trainer = self.trainer

        if trainer.mesh_config is not None:
            # Multi-host rendezvous must precede any other device use on TPU
            # pods; a single-process run proceeds unchanged.
            from tssep_tpu.dist import multihost
            multihost.initialize()

        checkpoint_path = trainer.checkpoint_dir / 'ckpt_latest.npz'
        resume = checkpoint_path.is_file()

        trainer.ensure_init()
        if not resume:
            self.init_ckpt(self)

        dp = trainer.data_parallel_size
        device = False if trainer.mesh_config is not None else None
        if dp > 1:
            for name, bs in (('train_batchsize', self.train_batchsize),
                             ('validation_batchsize',
                              self.validation_batchsize)):
                if bs is None or bs % dp != 0:
                    raise ValueError(
                        f'{name}={bs} must be set and divisible by the mesh '
                        f'data axis ({dp})')

        # Pre-flight: sorted (longest-first) datasets so OOM hits now, not at
        # hour 30 (reference model.py:199-219 rationale).  Batch size covers
        # the mesh data axis so the sharded step compiles here too.
        test_run_train_ds = trainer.model.prepare_train_dataset(
            prefetch=False, sort=True, batch_size=max(1, dp), device=device)
        test_run_validation_ds = trainer.model.prepare_validate_dataset(
            prefetch=False, sort=True, batch_size=self.validation_batchsize,
            device=device, drop_last=dp > 1)
        self.add_log_files(
            test_run_train_dataset=repr(test_run_train_ds),
            test_run_validation_dataset=repr(test_run_validation_ds),
        )
        print('Test run')
        trainer.test_run(test_run_train_ds, test_run_validation_ds,
                         virtual_minibatch_size=1)
        del test_run_train_ds, test_run_validation_ds
        print('Finished test run')

        # Multi-host: each host pipelines its round-robin example share and
        # batches global_batchsize/process_count of it; the Trainer assembles
        # the global sharded batch (dist.multihost.global_batch_from_local).
        import jax
        n_proc = jax.process_count()
        host_shard = trainer.mesh_config is not None and n_proc > 1
        train_bs, validation_bs = self.train_batchsize, \
            self.validation_batchsize
        if host_shard:
            assert train_bs % n_proc == 0, (train_bs, n_proc)
            assert validation_bs % n_proc == 0, (validation_bs, n_proc)
            train_bs //= n_proc
            validation_bs //= n_proc
        # drop_last under a mesh: a partial tail batch would violate the
        # data-axis divisibility in _place_batch (and desynchronize hosts'
        # batch counts over a finite validation set multi-host).
        validation_ds = trainer.model.prepare_validate_dataset(
            prefetch=True, batch_size=validation_bs, device=device,
            host_shard=host_shard, drop_last=dp > 1 or host_shard)
        train_ds = trainer.model.prepare_train_dataset(
            prefetch=True, batch_size=train_bs, device=device,
            host_shard=host_shard, drop_last=dp > 1)
        if self.cache_datasets_on_device:
            print('Caching datasets on device ...')
            validation_ds = validation_ds.copy(freeze=True)
            train_ds = train_ds.copy(freeze=True).shuffle(reshuffle=True)
        trainer.register_validation_hook(
            validation_ds, max_checkpoints=self.max_checkpoints)

        # Shape/parameter report (the reference's tracker table equivalent)
        from tssep_tpu.train.track import (
            cost_analysis_report, layer_time_report, model_report,
        )
        cost_report = ''
        time_report = ''
        try:
            ex = next(iter(trainer.model.prepare_validate_dataset(
                prefetch=False, batch_size=self.validation_batchsize)))
            from tssep_tpu.train.trainer import _array_part
            arrays, _ = _array_part(ex)
            import jax
            cost_report = cost_analysis_report(
                trainer._eval_fn, trainer.params, arrays,
                jax.random.PRNGKey(0))
            if trainer.mesh is None:
                # Per-layer timing (reference TimeTracker table); stages
                # are jitted unsharded, so skip under a mesh.
                time_report = layer_time_report(
                    trainer.model, trainer.params, arrays)
        except Exception as e:  # noqa: BLE001 - report is best-effort
            cost_report = cost_report or f'cost report unavailable: {e}'
            time_report = time_report or f'time report unavailable: {e}'
        self.add_log_files(
            train_dataset=repr(train_ds),
            validation_dataset=repr(validation_ds),
            trackers=model_report(trainer.model, trainer.params),
            cost=cost_report,
            layer_times=time_report,
        )

        print('Train')
        return trainer.train(train_ds, resume=resume)
