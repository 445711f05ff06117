"""Summary/observability tests: ReviewSummary accumulation, JSONL+TB flush,
multihost batch assembly."""

import json

import numpy as np
import pytest

from tssep_tpu.train.summary import ReviewSummary, SummaryWriter


def test_review_summary_accumulate_and_merge():
    s = ReviewSummary()
    s.add_to_loss(1.0)
    s.add_to_loss(3.0)
    s.add_scalar('a', 1)
    s.add_scalar('a', 2)
    s.add_histogram('h', np.ones(3))
    s2 = ReviewSummary()
    s2.add_scalar('a', 3)
    s2.add_to_loss(2.0)
    s.merge(s2)
    assert s.loss == 6.0 and s.loss_count == 3
    assert s.scalars['a'] == [1, 2, 3]


def test_summary_writer_jsonl_and_tb(tmp_path):
    w = SummaryWriter(tmp_path)
    s = ReviewSummary()
    s.add_to_loss(2.0)
    s.add_scalar('train_loss', 1.5)
    s.add_histogram('hist', np.arange(5))
    s.add_audio('audio', np.random.RandomState(0).randn(100), 8000)
    s.add_mask_image('mask', np.random.RandomState(0).rand(4, 6))
    record = w.flush(s, step=7, prefix='train/')
    assert record['train/loss'] == 2.0
    assert record['train/train_loss'] == 1.5
    w.scalar('validation/x', 0.25, 8)
    w.close()
    lines = [json.loads(line) for line in
             (tmp_path / 'metrics.jsonl').read_text().splitlines()]
    assert lines[0]['step'] == 7
    assert lines[1]['validation/x'] == 0.25
    # tensorboard event file written (tensorboardX available in this env)
    assert list(tmp_path.glob('events.out.tfevents.*'))


def test_global_batch_from_local():
    import jax
    from tssep_tpu.dist.mesh import make_mesh
    from tssep_tpu.dist.multihost import global_batch_from_local
    if len(jax.devices()) < 4:
        import pytest
        pytest.skip('needs >=4 devices')
    mesh = make_mesh(4, model_parallel=1)
    local = {'x': np.arange(8, dtype=np.float32).reshape(4, 2),
             'reference_channel': 0}
    out = global_batch_from_local(local, mesh)
    assert out['x'].shape == (4, 2)
    np.testing.assert_array_equal(np.asarray(out['x']), local['x'])
    assert out['x'].sharding.spec[0] == 'data'


@pytest.mark.slow
def test_training_emits_rich_snapshots(tmp_path):
    """Training (TS-SEP toy) emits audio + spectrogram/mask images at
    summary and validation triggers (reference model.py:692-752,
    loss.py:148-169)."""
    import sys
    sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
    from test_exp import _load_reduced
    from tssep_tpu.config.configurable import from_config
    from tssep_tpu.train.experiment import Experiment

    config = _load_reduced('init_cfg_tssep.yaml', tmp_path / 'tssep')
    config['eg']['init_ckpt'] = {
        'factory': 'tssep_tpu.train.init_ckpt.InitCheckPoint'}
    eg: Experiment = from_config(Experiment.get_config(config['eg']))
    eg.train()

    records = [json.loads(line) for line in
               (tmp_path / 'tssep' / 'metrics.jsonl').read_text().splitlines()]
    train_recs = [r for r in records if 'train/image_keys' in r]
    val_recs = [r for r in records if 'validation/image_keys' in r]
    assert train_recs, records
    assert val_recs, records
    imgs = train_recs[0]['train/image_keys']
    assert any('mask' in k for k in imgs), imgs
    assert any('stft' in k for k in imgs), imgs
    audios = train_recs[0]['train/audio_keys']
    assert any('audio_est' in k for k in audios), audios
    assert any('audio_observation' in k for k in audios), audios
    # snapshots never failed silently
    assert not any('snapshot_errors' in k for r in records for k in r), records

    # tfevents carry the payloads (tensorboardX available in this env)
    assert list((tmp_path / 'tssep').glob('events.out.tfevents.*'))


def test_tsvad_mask_snapshot_has_vad_overlay(tmp_path):
    """TS-VAD snapshots: mask images exist and include the VAD-target
    stripe (image wider than the bare mask)."""
    import jax
    import sys
    sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
    from test_exp import _load_reduced
    from tssep_tpu.config.configurable import from_config
    from tssep_tpu.train.experiment import Experiment

    config = _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'tsvad')
    eg: Experiment = from_config(Experiment.get_config(config['eg']))
    trainer = eg.trainer
    trainer.ensure_init()
    ds = trainer.model.prepare_validate_dataset(prefetch=False, batch_size=2)
    ex = next(iter(ds))
    from tssep_tpu.train.trainer import _array_part
    arrays, _ = _array_part(ex)
    s = ReviewSummary()
    trainer._add_snapshots(arrays, s, jax.random.PRNGKey(0))
    mask_imgs = {k: v for k, v in s.images.items() if 'mask' in k}
    assert mask_imgs, s.images.keys()
    assert 'Vad' in arrays
