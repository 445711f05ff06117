"""Model-assembly parity tests (goldens from reference ``model.py`` doctests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tssep_tpu.tasks.model import Model


@pytest.fixture(scope='module')
def toy_model():
    return Model.new({'mask_estimator': {'units': 10, 'projs': 12}})


def test_param_count_golden(toy_model):
    # reference model.py:552-554
    assert toy_model.num_params() == 114_038
    params = toy_model.init_params(jax.random.PRNGKey(0))
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    assert n == 114_038


def test_input_feature_goldens(toy_model):
    # reference model.py:570-575: norm 58.8257, std 0.0960, amax 1.0
    ds = toy_model.prepare_validate_dataset(prefetch=False, batch_size=2)
    ex = next(iter(ds))
    Obs = toy_model.fe.stft(ex['observation'])
    Input = toy_model.fe.stft_to_feature(Obs[..., 0, :, :]).astype(jnp.float32)
    assert Input.shape == (2, 316, 513)
    np.testing.assert_allclose(float(jnp.linalg.norm(Input)), 58.8257,
                               atol=1e-3)
    np.testing.assert_allclose(float(jnp.std(Input)), 0.0960, atol=1e-4)
    np.testing.assert_allclose(float(jnp.max(jnp.abs(Input))), 1.0, rtol=1e-6)


def test_forward_shapes(toy_model):
    # reference model.py:479-486
    ds = toy_model.prepare_validate_dataset(prefetch=False)
    ex = next(iter(ds))
    params = toy_model.init_params(jax.random.PRNGKey(0))
    arrays = {k: v for k, v in ex.items()
              if hasattr(v, 'shape') or k == 'reference_channel'}
    out = toy_model.forward(params, arrays, rng=jax.random.PRNGKey(1))
    assert out.mask.shape == (8, 1, 316, 513)
    assert out.logit.shape == (8, 1, 316, 513)
    assert out.embedding.shape == (8, 1, 100)
    assert out.stft_estimate.shape == (8, 316, 513)
    assert out.stft_estimate.dtype == jnp.complex64


def test_review_loss_close_to_reference(toy_model):
    # reference golden: loss 1.4861, per-example 0.74157/0.74449 — our init
    # RNG differs from torch's, so match to ~2%.
    ds = toy_model.prepare_validate_dataset(prefetch=False, batch_size=2)
    ex = next(iter(ds))
    params = toy_model.init_params(jax.random.PRNGKey(0))
    arrays = {k: v for k, v in ex.items()
              if hasattr(v, 'shape') or k == 'reference_channel'}
    loss_sum, aux = toy_model.loss_fn(params, arrays,
                                      rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss_sum), 1.4861, rtol=0.02)
    np.testing.assert_allclose(np.asarray(aux['per_example_loss']),
                               [0.74157, 0.74449], rtol=0.02)


@pytest.mark.slow
def test_grads_flow_through_everything(toy_model):
    ds = toy_model.prepare_validate_dataset(prefetch=False, batch_size=1)
    ex = next(iter(ds))
    params = toy_model.init_params(jax.random.PRNGKey(0))
    arrays = {k: v for k, v in ex.items()
              if hasattr(v, 'shape') or k == 'reference_channel'}
    g = jax.grad(lambda p: toy_model.loss_fn(
        p, arrays, rng=jax.random.PRNGKey(1))[0])(params)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert float(jnp.linalg.norm(leaf)) > 0, path


def test_vad_model_host_prepare():
    model = Model.new({
        'fe': {'size': 64, 'shift': 32, 'window_length': 64},
        'reader': {'sample_rate': 32, 'aux_size': 33},
        'mask_estimator': {'units': 2, 'projs': 3, 'combination': 'mul',
                           'ts_vad': 8, 'aux_net_output_size': 33,
                           'output_resolution': 't'},
        'loss': {'factory': 'tssep_tpu.tasks.losses.VADSigmoidBCE',
                 'target': 'Vad'},
    })
    ds = model.prepare_train_dataset(prefetch=False, batch_size=2)
    ex = next(iter(ds))
    vad = np.asarray(ex['Vad'])
    assert vad.shape[0] == 2 and vad.shape[1] == 8
    assert vad.dtype == np.float32
    assert set(np.unique(vad)) <= {0.0, 1.0}
    params = model.init_params(jax.random.PRNGKey(0))
    arrays = {k: v for k, v in ex.items()
              if hasattr(v, 'shape') or k == 'reference_channel'}
    loss_sum, _ = model.loss_fn(params, arrays, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss_sum))


def test_sorted_testrun_dataset(toy_model):
    ds = toy_model.prepare_train_dataset(prefetch=False, sort=True,
                                         batch_size=1)
    exs = list(ds)
    assert len(exs) == 10


@pytest.mark.slow
def test_explicit_vad_joint_loss_end_to_end():
    """SignalAndVADSigmoidBCE + explicit_vad head: forward, loss, grads."""
    import jax.numpy as jnp
    model = Model.new({
        'fe': {'size': 64, 'shift': 32, 'window_length': 64},
        'reader': {'sample_rate': 32, 'aux_size': 33},
        'mask_estimator': {'units': 2, 'projs': 3, 'combination': 'mul',
                           'ts_vad': 8, 'aux_net_output_size': 33,
                           'explicit_vad': True, 'output_resolution': 'tf'},
        'loss': {'factory':
                 'tssep_tpu.tasks.losses.SignalAndVADSigmoidBCE',
                 'target': 'Vad',
                 'signal_loss': {'factory': 'tssep_tpu.tasks.losses.LogMAE',
                                 'target':
                                 'speaker_reverberation_early_ch0'}},
    })
    assert model.loss.targets() == ('Vad', 'speaker_reverberation_early_ch0')
    params = model.init_params(jax.random.PRNGKey(0))
    ds = model.prepare_train_dataset(prefetch=False, batch_size=2)
    ex = next(iter(ds))
    arrays = {k: v for k, v in ex.items()
              if hasattr(v, 'shape') or k == 'reference_channel'}
    out = model.forward(params, arrays, rng=jax.random.PRNGKey(1))
    assert out.vad_logit is not None and out.logit is None
    loss_sum, _ = model.loss_fn(params, arrays, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss_sum))
    g = jax.grad(lambda p: model.loss_fn(
        p, arrays, rng=jax.random.PRNGKey(1))[0])(params)
    total = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g))
    assert total > 0


def test_aux_net_framewise_path():
    """AuxNet: per-speaker enrollment *sequences* -> embeddings, end to end
    through the mask estimator."""
    import jax.numpy as jnp
    from tssep_tpu.nn.estimator import AuxNet, MaskEstimator
    me = MaskEstimator(
        idim=20, odim=20, units=4, projs=5, combination='cat',
        aux_net=AuxNet(20), aux_net_output_size=20)
    params = me.init(jax.random.PRNGKey(0))
    xs = jnp.asarray(np.random.randn(2, 15, 20), dtype=jnp.float32)
    aux_seq = jnp.asarray(np.random.randn(2, 3, 9, 20), dtype=jnp.float32)
    lengths = jnp.asarray([[9, 5, 9], [3, 9, 9]])
    out = me.apply(params, xs, aux_seq, aux_lengths=lengths,
                   rng=jax.random.PRNGKey(1))
    assert out.mask.shape == (2, 3, 1, 15, 20)
    assert out.embedding.shape == (2, 3, 1, 20)


def test_nothing_and_dummy_enhancer():
    import jax.numpy as jnp
    from tssep_tpu.tasks.enhancer import Dummy, Nothing
    masks = jnp.ones((2, 3, 1, 10, 5))
    obs = jnp.ones((2, 1, 10, 5), dtype=jnp.complex64)
    ex = {'Observation': obs, 'reference_channel': 0}
    out = Nothing()(masks, ex, None)
    assert out.shape == (2, 1, 10, 5)
    assert Dummy()(masks, ex, None) is None


def test_save_wavs(tmp_path):
    from tssep_tpu.eval.driver import save_wavs
    result = {'time_estimate': np.random.RandomState(0).randn(2, 1000) * 0.1}
    paths = save_wavs(result, tmp_path, sample_rate=8000, example_id='ex0')
    assert len(paths) == 2
    for p in paths:
        assert p.exists() and p.stat().st_size > 2000


def test_shape_report(toy_model):
    from tssep_tpu.train.track import shape_report
    params = toy_model.init_params(jax.random.PRNGKey(0))
    ds = toy_model.prepare_validate_dataset(prefetch=False)
    ex = next(iter(ds))
    report = shape_report(toy_model, params, ex)
    assert 'pre_net' in report and 'mask' in report
    assert '(1, 316, 513)' in report  # feature shape


def test_loss_weights_mapping(tmp_path):
    """Trainer(loss_weights=...) maps component weights onto the joint
    loss (padertorch ``loss_weights`` equivalent)."""
    import jax.numpy as jnp
    from tssep_tpu.train.trainer import Trainer
    model = Model.new({
        'fe': {'size': 64, 'shift': 32, 'window_length': 64},
        'reader': {'sample_rate': 32, 'aux_size': 33},
        'mask_estimator': {'units': 2, 'projs': 3, 'combination': 'mul',
                           'ts_vad': 8, 'aux_net_output_size': 33,
                           'explicit_vad': True, 'output_resolution': 'tf'},
        'loss': {'factory':
                 'tssep_tpu.tasks.losses.SignalAndVADSigmoidBCE',
                 'target': 'Vad',
                 'signal_loss': {'factory': 'tssep_tpu.tasks.losses.LogMAE',
                                 'target':
                                 'speaker_reverberation_early_ch0'}},
    })
    trainer = Trainer(model, tmp_path,
                      loss_weights={'vad': 2.0, 'signal': 0.5})
    trainer.ensure_init()
    assert model.loss.vad_weight == 2.0
    assert model.loss.signal_weight == 0.5

    # Functional check: weights actually scale the components.
    params = trainer.params
    ds = model.prepare_train_dataset(prefetch=False, batch_size=2)
    ex = next(iter(ds))
    arrays = {k: v for k, v in ex.items()
              if hasattr(v, 'shape') or k == 'reference_channel'}
    rng = jax.random.PRNGKey(1)
    weighted, _ = model.loss_fn(params, arrays, rng=rng)
    model.loss.vad_weight, model.loss.signal_weight = 1.0, 1.0
    base, _ = model.loss_fn(params, arrays, rng=rng)
    model.loss.vad_weight, model.loss.signal_weight = 1.0, 0.0
    vad_only, _ = model.loss_fn(params, arrays, rng=rng)
    model.loss.vad_weight, model.loss.signal_weight = 0.0, 1.0
    sig_only, _ = model.loss_fn(params, arrays, rng=rng)
    np.testing.assert_allclose(
        float(base), float(vad_only) + float(sig_only), rtol=1e-5)
    np.testing.assert_allclose(
        float(weighted), 2.0 * float(vad_only) + 0.5 * float(sig_only),
        rtol=1e-5)

    # Unknown component name is rejected loudly.
    t2 = Trainer(model, tmp_path, loss_weights={'nope': 1.0})
    with pytest.raises(ValueError):
        t2.ensure_init()


def test_layer_time_report(toy_model):
    """Per-stage timing table (reference TimeTracker equivalent)."""
    from tssep_tpu.train.track import layer_time_report
    model = toy_model
    params = model.init_params(jax.random.PRNGKey(0))
    ds = model.prepare_train_dataset(prefetch=False, batch_size=2)
    ex = next(iter(ds))
    report = layer_time_report(model, params, ex, iters=1)
    assert 'fe.stft' in report
    assert 'pre_net' in report
    assert 'post_net.birnn0' in report
    assert 'ms' in report and 'total' in report
