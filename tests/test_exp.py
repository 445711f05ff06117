"""End-to-end integration tests, mirroring the reference's
``tests/test_exp.py``: shrunken toy configs trained for 2 iterations —
dataset prep, test_run pre-flight, trainer loop, checkpointing, validation,
and the two-stage TS-VAD -> TS-SEP warm start (through the real CLI
subprocesses)."""

import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np
import pytest

from tssep_tpu.config.configurable import (
    NestedView, from_config, load_yaml, nested_merge,
)
from tssep_tpu.train.experiment import Experiment

_exp_dir = Path(__file__).parent.parent / 'tssep_tpu' / 'exp'


def reduce_parameters(config, *updates):
    """Shrink the toy config for speed (reference test_exp.py:14-95)."""
    flat = NestedView(config)

    changes = {}
    changes['eg.trainer.summary_trigger'] = [1, 'iteration']
    changes['eg.trainer.checkpoint_trigger'] = [1, 'iteration']
    changes['eg.trainer.stop_trigger'] = [2, 'iteration']
    changes['eg.trainer.model.mask_estimator.units'] = 2
    changes['eg.trainer.model.mask_estimator.projs'] = 3
    changes['eg.trainer.model.mask_estimator.num_averaged_permutations'] = 1
    changes['eg.trainer.model.reader.sample_rate'] = 32

    changes['eg.trainer.model.fe.size'] = 64
    changes['eg.trainer.model.fe.shift'] = 32
    changes['eg.trainer.model.fe.window_length'] = 64
    for fe in ['fe1', 'fe2']:
        changes[f'eg.trainer.model.fe.{fe}.size'] = 64
        changes[f'eg.trainer.model.fe.{fe}.shift'] = 32
        changes[f'eg.trainer.model.fe.{fe}.window_length'] = 64
    changes['eg.trainer.model.fe.fe1.output_size'] = 40
    changes['eg.trainer.model.fe.fe2.output_size'] = 64 // 2 + 1
    changes['eg.trainer.model.fe.output_size'] = 40 + 33
    changes['eg.trainer.model.mask_estimator.idim'] = 40 + 33
    changes['eg.trainer.model.mask_estimator.odim'] = 33
    changes['eg.trainer.model.reader.aux_size'] = 33
    changes['eg.trainer.model.mask_estimator.aux_net_output_size'] = 33

    for k, v in changes.items():
        _ = flat[k]
        flat[k] = v

    for u in updates:
        config = nested_merge(config, u)
    return config


def _load_reduced(extra_yaml, storage_dir):
    config = load_yaml(_exp_dir / 'init_cfg_common.yaml')
    config = reduce_parameters(
        config,
        load_yaml(_exp_dir / extra_yaml),
        {'eg': {'trainer': {'storage_dir': str(storage_dir)}}},
    )
    return config


def test_run_tsvad(tmp_path):
    config = _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'tsvad')
    eg_cfg = Experiment.get_config(config['eg'])
    eg: Experiment = from_config(eg_cfg)
    it = eg.train()
    assert it == 2
    ckpt_dir = tmp_path / 'tsvad' / 'checkpoints'
    assert (ckpt_dir / 'ckpt_latest.npz').exists()
    assert (ckpt_dir / 'ckpt_best_loss.npz').exists()
    assert (ckpt_dir / 'ckpt_2.npz').exists()
    assert (tmp_path / 'tsvad' / 'metrics.jsonl').exists()


@pytest.mark.slow
def test_run_tssep(tmp_path):
    config = _load_reduced('init_cfg_tssep.yaml', tmp_path / 'tssep')
    # no warm-start checkpoint in this test
    config['eg']['init_ckpt'] = {
        'factory': 'tssep_tpu.train.init_ckpt.InitCheckPoint'}
    eg_cfg = Experiment.get_config(config['eg'])
    eg: Experiment = from_config(eg_cfg)
    it = eg.train()
    assert it == 2
    assert (tmp_path / 'tssep' / 'checkpoints' / 'ckpt_best_loss.npz').exists()


@pytest.mark.slow
def test_early_stop_patience(tmp_path, monkeypatch):
    """early_stop_patience stops training once validation stops improving
    (the round-3 rehearsal overfit for 800 iterations; the evaluated best
    checkpoint was from iteration ~400)."""
    from tssep_tpu.train.trainer import Trainer

    config = _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'tsvad')
    nv = NestedView(config)
    nv['eg.trainer.stop_trigger'] = [10, 'iteration']
    nv['eg.trainer.checkpoint_trigger'] = [1, 'iteration']
    config['eg']['trainer']['early_stop_patience'] = 2
    # deterministic validation trajectory: improves once, then plateaus
    losses = iter([1.0, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0, 1.1, 1.2, 1.3])

    from tssep_tpu.train.summary import ReviewSummary
    monkeypatch.setattr(
        Trainer, 'validate', lambda self: (next(losses), ReviewSummary()))
    eg = from_config(Experiment.get_config(config['eg']))
    it = eg.train()
    # best at it=2 (0.5); non-improving at 3 and 4 -> stop at iteration 4
    assert it == 4, it
    assert (eg.trainer.checkpoint_dir / 'ckpt_best_loss.npz').exists()


@pytest.mark.slow
def test_resume(tmp_path):
    """Training twice resumes from ckpt_latest (reference resume semantics)."""
    config = _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'tsvad')
    eg = from_config(Experiment.get_config(config['eg']))
    eg.train()
    config2 = _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'tsvad')
    nv = NestedView(config2)
    nv['eg.trainer.stop_trigger'] = [4, 'iteration']
    eg2: Experiment = from_config(Experiment.get_config(config2['eg']))
    it = eg2.train()
    assert it == 4
    assert eg2.trainer.iteration == 4


@pytest.mark.slow
def test_run_tsvad_tssep_cli(tmp_path):
    """Full two-stage recipe through the real CLI subprocesses: config
    layering/dump, Makefile, warm start with VAD->SEP broadcast."""
    import yaml
    from tssep_tpu.exp import run_tsvad, run_tssep

    config = load_yaml(_exp_dir / 'init_cfg_common.yaml')
    config = reduce_parameters(config)
    config_file = tmp_path / 'init_cfg_common.yaml'
    config_file.write_text(yaml.dump(config))

    env = dict(os.environ, JAX_PLATFORMS='cpu')
    # hermetic even when the repo isn't pip-installed in this venv: the
    # launcher subprocesses run with cwd=storage_dir
    repo_root = str(Path(__file__).resolve().parent.parent)
    env['PYTHONPATH'] = repo_root + os.pathsep + env.get('PYTHONPATH', '')

    def patched_run(cmd, failure='raise', cwd=None):
        printable = cmd if isinstance(cmd, str) else ' '.join(map(str, cmd))
        print(f'$ {printable}')
        result = subprocess.run(
            cmd if isinstance(cmd, list) else ['bash', '-c', cmd],
            cwd=cwd, env=env)
        assert result.returncode == 0, (printable, result.returncode)

    storage_dir = tmp_path / 'tsvad'
    run_tsvad.run.__globals__  # noqa: B018 - just assert import works
    import unittest.mock as mock
    with mock.patch.object(run_tsvad, 'run', patched_run):
        run_tsvad.main(
            configs=[config_file, _exp_dir / 'init_cfg_tsvad.yaml'],
            storage_dir=storage_dir)

    checkpoint = storage_dir / 'checkpoints' / 'ckpt_best_loss.npz'
    assert checkpoint.exists()
    assert (storage_dir / 'config.yaml').exists()
    assert (storage_dir / 'Makefile').exists()
    assert (storage_dir / 'python_history.txt').exists()

    with mock.patch.object(run_tssep, 'run', patched_run):
        run_tssep.main(
            configs=[config_file, _exp_dir / 'init_cfg_tssep.yaml'],
            storage_dir=tmp_path / 'tssep', checkpoint=checkpoint)
    assert (tmp_path / 'tssep' / 'checkpoints' / 'ckpt_latest.npz').exists()


def test_vad2sep_broadcast(tmp_path):
    """The VAD->SEP warm start: per-frame activity head widened to
    per-(frame,freq) mask head by repeat-broadcast (reference
    init_ckpt.py:66-85)."""
    import jax
    from tssep_tpu.train.checkpoint import (
        load_checkpoint, params_to_named, save_checkpoint,
    )
    from tssep_tpu.train.init_ckpt import InitCheckPointVAD2Sep, broadcast_param

    # TS-VAD model: head out = spk*nmask = 8
    vad_config = _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'tsvad')
    eg_vad: Experiment = from_config(Experiment.get_config(vad_config['eg']))
    eg_vad.trainer.ensure_init()
    named = params_to_named(eg_vad.trainer.params)
    w = named['mask_estimator.post_net.linear2.weight']
    assert w.shape == (8, 3)  # (spk*nmask, projs)
    path = save_checkpoint(tmp_path / 'ck', 7, eg_vad.trainer.params)

    # TS-SEP model: head out = freq*nmask*spk = 33*8 = 264
    sep_config = _load_reduced('init_cfg_tssep.yaml', tmp_path / 'tssep')
    sep_config['eg']['init_ckpt'] = {
        'factory': 'tssep_tpu.train.init_ckpt.InitCheckPointVAD2Sep',
        'init_ckpt': str(path)}
    eg_sep: Experiment = from_config(Experiment.get_config(sep_config['eg']))
    eg_sep.trainer.ensure_init()
    eg_sep.init_ckpt(eg_sep)
    named_sep = params_to_named(eg_sep.trainer.params)
    w_sep = named_sep['mask_estimator.post_net.linear2.weight']
    assert w_sep.shape == (264, 3)
    # repeat semantics: each VAD neuron tiled over its 33 freq bins
    np.testing.assert_array_equal(w_sep[:33], np.broadcast_to(w[0], (33, 3)))
    np.testing.assert_array_equal(w_sep[33:66], np.broadcast_to(w[1], (33, 3)))

    def test_broadcast_modes():
        p = np.array([[0.], [1.], [2.]])
        np.testing.assert_array_equal(
            broadcast_param(p, (6, 1), 'repeat').ravel(),
            [0, 0, 1, 1, 2, 2])
        np.testing.assert_array_equal(
            broadcast_param(p, (6, 1), 'tile').ravel(),
            [0, 1, 2, 0, 1, 2])
    test_broadcast_modes()


@pytest.mark.slow
def test_eval_cli(tmp_path):
    """Train the shrunken TS-VAD toy then score it through the eval CLI
    entry (checkpoint loading, eval dataset, DER, wav export)."""
    config = _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'tsvad')
    nv = NestedView(config)
    nv['eg.trainer.stop_trigger'] = [3, 'iteration']
    eg = from_config(Experiment.get_config(config['eg']))
    eg.train()

    from tssep_tpu.eval.run import evaluate
    eg2: Experiment = from_config(Experiment.get_config(
        _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'tsvad')['eg']))
    metrics = evaluate(eg2, limit=2)
    assert metrics['summary']['num_recordings'] == 2
    assert 'mean_der' in metrics['summary']
    assert 0 <= metrics['summary']['mean_der'] <= 3
    out_dir = tmp_path / 'tsvad' / 'eval' / '3'
    assert (out_dir / 'metrics.json').exists()
    wavs = list((out_dir / 'audio').glob('*.wav'))
    assert len(wavs) == 2 * 8  # 2 recordings x 8 speakers


@pytest.mark.slow
def test_eval_joint_dia(tmp_path):
    """evaluate(dia_eg=...) — the canonical joint deployment: diarization
    (activity + threshold calibration) comes from the dia experiment's
    model, masks from the main experiment's.  Validated by making the
    dia model a DIFFERENT training state and checking its checkpoint is
    what gets loaded for diarization."""
    config = _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'vad')
    nv = NestedView(config)
    nv['eg.trainer.stop_trigger'] = [3, 'iteration']
    eg_vad = from_config(Experiment.get_config(config['eg']))
    eg_vad.train()

    config2 = _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'sep')
    nv2 = NestedView(config2)
    nv2['eg.trainer.stop_trigger'] = [2, 'iteration']
    eg_sep = from_config(Experiment.get_config(config2['eg']))
    eg_sep.train()

    from tssep_tpu.eval.run import evaluate
    eg_sep2 = from_config(Experiment.get_config(
        _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'sep')['eg']))
    eg_vad2 = from_config(Experiment.get_config(
        _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'vad')['eg']))
    metrics = evaluate(eg_sep2, limit=1, dia_eg=eg_vad2,
                       out=tmp_path / 'joint_out')
    assert metrics['summary']['num_recordings'] == 1
    # the dia experiment's best checkpoint was loaded for diarization
    assert eg_vad2.trainer.iteration == 3
    # and the main model's own checkpoint drives the masks
    assert eg_sep2.trainer.iteration == 2
    assert (tmp_path / 'joint_out' / 'metrics.json').exists()


@pytest.mark.slow
def test_checkpoint_retention(tmp_path):
    """max_checkpoints prunes numbered checkpoints, keeping best/latest
    targets (reference checkpoint bookkeeping, ``experiment.py:224``)."""
    config = _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'tsvad')
    nv = NestedView(config)
    nv['eg.trainer.stop_trigger'] = [5, 'iteration']
    config['eg']['max_checkpoints'] = 2
    eg: Experiment = from_config(Experiment.get_config(config['eg']))
    eg.train()
    ckpt_dir = tmp_path / 'tsvad' / 'checkpoints'
    latest = (ckpt_dir / 'ckpt_latest.npz').resolve()
    best = (ckpt_dir / 'ckpt_best_loss.npz').resolve()
    assert latest.exists() and best.exists()
    numbered = [p for p in ckpt_dir.glob('ckpt_*.npz')
                if p.stem.split('_')[-1].isdigit()]
    # at most 2 numbered kept, plus the best target if it is older
    extra = {best.name} - {p.name for p in sorted(
        numbered, key=lambda p: int(p.stem.split('_')[-1]))[-2:]}
    assert len(numbered) <= 2 + len(extra)
    assert latest.name in {p.name for p in numbered}


def test_host_info_capture(tmp_path):
    """init writes host_info.json (sacred host-info equivalent,
    reference run.py:59-68)."""
    import json
    from tssep_tpu.train.run import host_info, init
    info = host_info()
    assert 'hostname' in info and 'jax' in info and 'env' in info
    config = _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'tsvad')
    config['eg'] = Experiment.get_config(config['eg'])
    init(config)
    captured = json.loads((tmp_path / 'tsvad' / 'host_info.json').read_text())
    assert captured['python'] == info['python']
    assert isinstance(captured['env'], dict)


@pytest.mark.slow
def test_async_checkpoints(tmp_path):
    """async_checkpoints=True overlaps checkpoint IO with training; files
    land on disk by train() return, resume works (Orbax-async idea on the
    npz format)."""
    config = _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'tsvad')
    config['eg']['trainer']['async_checkpoints'] = True
    eg: Experiment = from_config(Experiment.get_config(config['eg']))
    assert eg.trainer.async_checkpoints is True
    eg.train()
    ckpt_dir = tmp_path / 'tsvad' / 'checkpoints'
    assert (ckpt_dir / 'ckpt_latest.npz').exists()
    assert (ckpt_dir / 'ckpt_best_loss.npz').exists()
    # resume through load() (waits for pending writes)
    config2 = _load_reduced('init_cfg_tsvad.yaml', tmp_path / 'tsvad')
    config2['eg']['trainer']['async_checkpoints'] = True
    nv = NestedView(config2)
    nv['eg.trainer.stop_trigger'] = [4, 'iteration']
    eg2: Experiment = from_config(Experiment.get_config(config2['eg']))
    assert eg2.train() == 4


def test_cli_flag_parsing():
    """'--pdb'-style flags are accepted and don't pollute files/overrides."""
    from tssep_tpu.train.run import parse_argv
    command, files, overrides = parse_argv(
        ['train', 'with', 'cfg.yaml', 'a.b=1', '--pdb'])
    assert command == 'train'
    assert files == ['cfg.yaml']
    assert overrides == {'a.b': 1}


def test_cli_unknown_flag_rejected():
    from tssep_tpu.train.run import parse_argv
    with pytest.raises(ValueError, match='Unknown flag'):
        parse_argv(['train', 'with', 'cfg.yaml', '--pdp'])


def test_checkpoint_write_false_skips_io(tmp_path):
    """write=False runs the host-gather but leaves no files (the multi-host
    non-zero-process path; all processes must reach the collective)."""
    import jax.numpy as jnp
    from tssep_tpu.train.checkpoint import save_checkpoint
    params = {'w': jnp.ones((3, 3))}
    out = save_checkpoint(tmp_path / 'ck', 5, params, write=False)
    assert out is None
    assert not (tmp_path / 'ck').exists()
    path = save_checkpoint(tmp_path / 'ck', 5, params, write=True)
    assert path.exists()
