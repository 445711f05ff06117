"""Distributed training through the REAL training path.

The reference has no distributed backend (its only multi-device line is
``torch.nn.DataParallel``, reference ``experiment.py:313-314``); these tests
cover the framework's mesh-integrated Trainer/Experiment on the 8-virtual-
device CPU mesh (conftest.py):

- data-parallel training through ``Experiment.train()`` reproduces the
  single-device loss trajectory / parameters,
- the shard_map path (used with the Pallas backend on TPU) does too,
- data x model parallel training runs end-to-end with checkpoints + resume,
- the Pallas backend is fenced to 'scan' under tensor parallelism.
"""

import numpy as np
import pytest

import jax

from tssep_tpu.config.configurable import NestedView, from_config
from tssep_tpu.train.experiment import Experiment

from test_exp import _load_reduced


def _prepare(tmp_path, name, mesh=None, stop=3, train_examples=8):
    config = _load_reduced('init_cfg_tsvad.yaml', tmp_path / name)
    nv = NestedView(config)
    nv['eg.trainer.stop_trigger'] = [stop, 'iteration']
    # Deterministic forward (no RNG-dependent speaker permutation) so the
    # sharded and single-device runs are numerically comparable.
    nv['eg.trainer.model.mask_estimator.random_speaker_order'] = False
    config['eg']['trainer']['model']['reader']['train_examples'] = \
        train_examples
    config['eg']['trainer']['mesh'] = mesh
    config['eg']['train_batchsize'] = 4
    config['eg']['validation_batchsize'] = 4
    eg: Experiment = from_config(Experiment.get_config(config['eg']))
    return eg


def _named(params):
    from tssep_tpu.train.checkpoint import params_to_named
    return params_to_named(params)


def _train_losses(storage_dir):
    """Per-iteration train loss from metrics.jsonl (summary_trigger=1)."""
    import json
    out = {}
    for line in (storage_dir / 'metrics.jsonl').read_text().splitlines():
        rec = json.loads(line)
        if 'train/loss' in rec:
            out[rec['step']] = rec['train/loss']
    return out


@pytest.fixture(scope='module')
def single_device_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('single')
    eg = _prepare(tmp, 'tsvad', mesh=None)
    eg.train()
    return _named(eg.trainer.params), _train_losses(tmp / 'tsvad')


@pytest.mark.slow
def test_dp_mesh_matches_single_device(tmp_path, single_device_run):
    """4-way data-parallel (XLA SPMD partitioning) == single device."""
    ref_params, ref_losses = single_device_run
    eg = _prepare(tmp_path, 'tsvad_dp', mesh={'data': 4, 'model': 1})
    eg.train()
    assert eg.trainer.mesh is not None
    assert dict(eg.trainer.mesh.shape) == {'data': 4, 'model': 1}
    assert not eg.trainer._use_shard_map
    got = _named(eg.trainer.params)
    for k, ref in ref_params.items():
        np.testing.assert_allclose(
            got[k], ref, rtol=1e-4, atol=1e-5, err_msg=k)
    ckpt_dir = tmp_path / 'tsvad_dp' / 'checkpoints'
    assert (ckpt_dir / 'ckpt_latest.npz').exists()


@pytest.mark.slow
def test_shard_map_dp_matches_single_device(tmp_path, single_device_run):
    """The explicit shard_map step (the path the Pallas backend uses on
    TPU) == single device: identical first-step loss (same params, same
    global batch — only the psum reduction order differs), and parameters
    that track the single-device trajectory (Adam's 1/sqrt(v) amplifies
    reduction-order noise on near-zero gradient coordinates, so the
    per-parameter bound is ~lr-scale, far below any real divergence)."""
    ref_params, ref_losses = single_device_run
    eg = _prepare(tmp_path, 'tsvad_sm',
                  mesh={'data': 4, 'model': 1, 'shard_map': True})
    eg.train()
    assert eg.trainer._use_shard_map
    got_losses = _train_losses(tmp_path / 'tsvad_sm')
    assert ref_losses and got_losses.keys() == ref_losses.keys()
    first = min(ref_losses)
    np.testing.assert_allclose(got_losses[first], ref_losses[first],
                               rtol=1e-5)
    got = _named(eg.trainer.params)
    for k, ref in ref_params.items():
        np.testing.assert_allclose(
            got[k], ref, rtol=2e-2, atol=3e-3, err_msg=k)


@pytest.mark.slow
def test_mesh_model_parallel_end_to_end(tmp_path):
    """data=2 x model=2 through Experiment.train(): finite losses,
    checkpoints written, resume continues on the mesh."""
    eg = _prepare(tmp_path, 'tsvad_tp', mesh={'data': 2, 'model': 2}, stop=2)
    it = eg.train()
    assert it == 2
    ckpt_dir = tmp_path / 'tsvad_tp' / 'checkpoints'
    assert (ckpt_dir / 'ckpt_latest.npz').exists()
    assert (ckpt_dir / 'ckpt_best_loss.npz').exists()

    # Gate matrices actually sharded over 'model'
    from tssep_tpu.dist.mesh import MODEL_AXIS
    flat = _named(eg.trainer.params)
    leaves = jax.tree_util.tree_flatten_with_path(eg.trainer.params)[0]
    sharded = [
        '.'.join(str(getattr(p, 'key', p)) for p in path)
        for path, leaf in leaves
        if hasattr(leaf, 'sharding')
        and MODEL_AXIS in (leaf.sharding.spec or ())
    ]
    assert any('weight_ih' in n or 'weight_hh' in n for n in sharded), sharded
    assert flat  # host fetch of sharded params works

    # Resume on the mesh
    eg2 = _prepare(tmp_path, 'tsvad_tp', mesh={'data': 2, 'model': 2}, stop=4)
    it = eg2.train()
    assert it == 4
    assert eg2.trainer.iteration == 4


@pytest.mark.slow
def test_tp_mesh_matches_single_device(tmp_path, single_device_run):
    """data=2 x model=2 == single device: loss trajectory AND final
    parameters.  Tensor parallelism here is pure SPMD partitioning of the
    unchanged step function (gate matrices sharded over 'model', XLA
    inserts the collectives), so it must be numerically equivalent to the
    single-device trajectory — the same bar the DP tests set.  This is
    the evidence that TP is a real capability (memory headroom for scaled
    -up trunks), not speculative plumbing; see dist/mesh.py for why it is
    still not the recommended *performance* mesh for the flagship size."""
    ref_params, ref_losses = single_device_run
    eg = _prepare(tmp_path, 'tsvad_tp_eq', mesh={'data': 2, 'model': 2})
    eg.train()
    assert dict(eg.trainer.mesh.shape) == {'data': 2, 'model': 2}
    got_losses = _train_losses(tmp_path / 'tsvad_tp_eq')
    assert ref_losses and got_losses.keys() == ref_losses.keys()
    for step in sorted(ref_losses):
        np.testing.assert_allclose(
            got_losses[step], ref_losses[step], rtol=2e-3,
            err_msg=f'TP loss diverged from single device at step {step}')
    got = _named(eg.trainer.params)
    for k, ref in ref_params.items():
        np.testing.assert_allclose(
            got[k], ref, rtol=2e-2, atol=3e-3, err_msg=k)


@pytest.mark.slow
def test_mesh_validation_and_metrics(tmp_path):
    """Validation hook + summary writer run under the mesh."""
    eg = _prepare(tmp_path, 'tsvad_val', mesh={'data': 4, 'model': 1}, stop=2)
    eg.train()
    metrics = (tmp_path / 'tsvad_val' / 'metrics.jsonl').read_text()
    assert 'validation/mean_loss' in metrics
    assert 'examples_per_second' in metrics


def test_pallas_fenced_to_scan_under_model_parallel(tmp_path, monkeypatch):
    """When the recurrence backend would be Pallas, a model-parallel mesh
    forces the scan backend (the fused kernel is not partition-aware)."""
    from tssep_tpu.nn import rnnp
    from tssep_tpu.train.trainer import Trainer

    monkeypatch.setattr(rnnp, 'DEFAULT_IMPL', 'pallas')
    try:
        eg = _prepare(tmp_path, 'tsvad_fence', mesh={'data': 2, 'model': 2})
        trainer: Trainer = eg.trainer
        trainer._ensure_mesh()
        assert rnnp._FORCED_IMPL == 'scan'
        assert rnnp._resolve_impl('pallas') == 'scan'
        assert not trainer._use_shard_map
    finally:
        rnnp.force_impl(None)


def test_batch_divisibility_error(tmp_path):
    """A batch that does not divide the data axis fails loudly."""
    eg = _prepare(tmp_path, 'tsvad_bad', mesh={'data': 4, 'model': 1})
    eg.train_batchsize = 3
    with pytest.raises(ValueError, match='divisible'):
        eg.train()


@pytest.mark.slow
def test_grad_accumulation_under_mesh(tmp_path):
    """virtual_minibatch_size > 1 under a DP mesh reproduces the
    single-device accumulated trajectory (same optimizer-step count and
    parameters)."""
    eg_s = _prepare(tmp_path, 'single_vmb', mesh=None)
    eg_s.trainer.virtual_minibatch_size = 2
    eg_s.train()
    ref_params = _named(eg_s.trainer.params)

    eg_m = _prepare(tmp_path, 'mesh_vmb', mesh={'data': 4, 'model': 1})
    eg_m.trainer.virtual_minibatch_size = 2
    eg_m.train()
    got_params = _named(eg_m.trainer.params)

    assert eg_m.trainer.iteration == eg_s.trainer.iteration == 3
    for k in ref_params:
        np.testing.assert_allclose(
            got_params[k], ref_params[k], atol=2e-5, rtol=2e-4,
            err_msg=f'param {k} diverged under mesh accumulation')


@pytest.mark.slow
def test_sharded_rng_speaker_order_consistency(tmp_path):
    """With random_speaker_order=True the per-example permutation draw is
    identical under mesh=None, jit-SPMD DP, and the shard_map path: every
    mode derives example i's key as split(step_key, B_global)[i] (the
    shard_map caller pre-splits outside the shard — an in-shard
    split(key, B_local) would silently duplicate draws across shards).
    Identical draws => identical loss trajectories; a duplicated/diverged
    permutation shifts the loss at O(1e-2), far above the tolerance."""

    def run(name, mesh):
        config = _load_reduced('init_cfg_tsvad.yaml', tmp_path / name)
        nv = NestedView(config)
        nv['eg.trainer.stop_trigger'] = [2, 'iteration']
        nv['eg.trainer.model.mask_estimator.random_speaker_order'] = True
        config['eg']['trainer']['model']['reader']['train_examples'] = 8
        config['eg']['trainer']['mesh'] = mesh
        config['eg']['train_batchsize'] = 4
        config['eg']['validation_batchsize'] = 4
        eg: Experiment = from_config(Experiment.get_config(config['eg']))
        eg.train()
        return _train_losses(tmp_path / name)

    ref = run('rng_single', None)
    spmd = run('rng_spmd', {'data': 4, 'model': 1})
    smap = run('rng_smap', {'data': 4, 'model': 1, 'shard_map': True})
    assert ref and ref.keys() == spmd.keys() == smap.keys()
    for step in ref:
        np.testing.assert_allclose(
            spmd[step], ref[step], rtol=1e-5,
            err_msg=f'jit-SPMD permutation draw diverged at step {step}')
        np.testing.assert_allclose(
            smap[step], ref[step], rtol=1e-5,
            err_msg=f'shard_map permutation draw diverged at step {step}')


@pytest.mark.slow
def test_validation_partial_batch_dropped_under_mesh(tmp_path):
    """A validation set whose size isn't divisible by the batch leaves a
    partial tail batch; under a mesh it must be dropped, not crash
    _place_batch at the first validation trigger."""
    eg = _prepare(tmp_path, 'valtail', mesh={'data': 4, 'model': 1})
    # 6 validation examples, batch 4 -> tail batch of 2 (2 % 4 != 0)
    eg.trainer.model.reader.validate_examples = 6
    it = eg.train()
    assert it == 3
    assert (tmp_path / 'valtail' / 'checkpoints' / 'ckpt_latest.npz').exists()
