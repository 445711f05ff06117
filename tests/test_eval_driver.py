"""Long-recording eval driver tests: chunk stitching exactness, diarization
interval extraction, end-to-end mechanics on toy data."""

import jax
import numpy as np

from tssep_tpu.eval.driver import (
    ChunkedMaskEstimator, EvalDriver, _chunk_starts, diarize_from_activity,
    stitch_chunks,
)
from tssep_tpu.tasks.model import Model


def test_chunk_starts_cover():
    for n, c, h in [(100, 30, 15), (100, 30, 30), (29, 30, 15), (31, 30, 15)]:
        starts = _chunk_starts(n, min(c, n), min(h, min(c, n)))
        assert starts[0] == 0
        assert starts[-1] + min(c, n) >= n


def test_stitch_identity():
    """Chunking + stitching a signal that is consistent across chunks must
    reproduce it exactly."""
    t, chunk, hop = 100, 30, 15
    x = np.arange(t, dtype=np.float64)[None, :] * np.ones((4, 1))
    starts = _chunk_starts(t, chunk, hop)
    chunks = [x[:, s:s + chunk] for s in starts]
    out = stitch_chunks(chunks, starts, t, chunk, hop, time_axis=-1)
    np.testing.assert_array_equal(out, x)


def test_diarize_from_activity():
    act = np.zeros((2, 100))
    act[0, 10:40] = 0.9
    act[1, 50:80] = 0.8
    act[1, 55] = 0.1  # hole to be smoothed over
    dia = diarize_from_activity(act, threshold=0.5, smooth_kernel=5)
    assert dia[0].normalized_intervals == ((10, 40),)
    assert dia[1].normalized_intervals == ((50, 80),)


def test_diarize_merge_gap():
    """merge_gap bridges in-turn pauses (word corpora) but not real
    inter-turn silence; min_frames applies after the merge."""
    act = np.zeros((1, 100))
    act[0, 10:20] = 1.0
    act[0, 26:36] = 1.0   # 6-frame pause: in-turn
    act[0, 70:72] = 1.0   # far + short: separate, dropped by min_frames
    dia = diarize_from_activity(act, threshold=0.5, smooth_kernel=1,
                                min_frames=4, merge_gap=8)
    assert dia[0].normalized_intervals == ((10, 36),)
    dia = diarize_from_activity(act, threshold=0.5, smooth_kernel=1,
                                min_frames=4, merge_gap=0)
    assert dia[0].normalized_intervals == ((10, 20), (26, 36))


def _tiny_model():
    return Model.new({
        'fe': {'size': 64, 'shift': 32, 'window_length': 64},
        'reader': {'sample_rate': 1000, 'aux_size': 33},
        'mask_estimator': {'units': 4, 'projs': 5, 'combination': 'mul',
                           'ts_vad': 8, 'aux_net_output_size': 33,
                           'num_averaged_permutations': 1,
                           'random_speaker_order': False},
    })


def test_chunked_mask_estimator_matches_single_shot():
    """For a recording shorter than one chunk, chunked == direct forward."""
    model = _tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    ds = model.prepare_validate_dataset(prefetch=False)
    ex = next(iter(ds))
    obs = np.asarray(ex['observation'])
    obs_stft = model.fe.stft(obs)
    aux = np.asarray(ex['auxInput'])
    cme = ChunkedMaskEstimator(model, chunk_frames=10_000, hop_frames=5_000)
    masks, activity = cme(params, np.asarray(obs_stft), aux)
    assert masks.shape[0] == 8 and masks.shape[1] == 1
    assert activity.shape[0] == 8
    assert masks.shape[-2] == activity.shape[-1] == obs_stft.shape[-2]

    # direct forward
    import jax.numpy as jnp
    feats = model.fe.stft_to_feature(jnp.asarray(obs_stft)[0]).astype(
        jnp.float32)
    out = model.mask_estimator.apply(
        params['mask_estimator'], feats, jnp.asarray(aux))
    np.testing.assert_allclose(masks, np.asarray(out.mask), atol=1e-5)


def test_chunked_stitching_consistent():
    """Chunked inference over overlapping windows produces per-frame masks
    whose active shape matches the recording length, without NaNs/gaps."""
    model = _tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    ds = model.prepare_validate_dataset(prefetch=False)
    ex = next(iter(ds))
    obs_stft = np.asarray(model.fe.stft(np.asarray(ex['observation'])))
    cme = ChunkedMaskEstimator(model, chunk_frames=40, hop_frames=20,
                               batch_chunks=3)
    masks, activity = cme(params, obs_stft, np.asarray(ex['auxInput']))
    assert masks.shape[-2] == obs_stft.shape[-2]
    assert np.isfinite(masks).all() and np.isfinite(activity).all()
    assert (masks >= 0).all() and (masks <= 1).all()


def test_eval_driver_end_to_end():
    model = _tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    ds = model.prepare_validate_dataset(prefetch=False)
    ex = next(iter(ds))
    obs = np.asarray(ex['observation'])
    driver = EvalDriver(model, chunk_frames=40, hop_frames=20,
                        smooth_kernel=3, min_frames=1)
    result = driver.run_recording(params, obs, np.asarray(ex['auxInput']))
    assert result['time_estimate'].shape == (8, obs.shape[-1])
    assert len(result['dia']) == 8
    assert len(result['sample_dia']) == 8
    score = driver.score_der(result, np.asarray(ex['vad']))
    assert 0 <= score['der']
    assert np.isfinite(np.asarray(result['time_estimate'])).all()


def test_chunked_mask_estimator_on_mesh():
    """Segment-parallel inference: chunk batch sharded over a 'data' mesh."""
    import jax
    from tssep_tpu.dist.mesh import make_mesh
    if len(jax.devices()) < 4:
        import pytest
        pytest.skip('needs >=4 devices')
    mesh = make_mesh(4, model_parallel=1)
    model = _tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    ds = model.prepare_validate_dataset(prefetch=False)
    ex = next(iter(ds))
    obs_stft = np.asarray(model.fe.stft(np.asarray(ex['observation'])))
    cme = ChunkedMaskEstimator(model, chunk_frames=40, hop_frames=20,
                               batch_chunks=4, mesh=mesh)
    masks, activity = cme(params, obs_stft, np.asarray(ex['auxInput']))
    # identical to unsharded
    cme2 = ChunkedMaskEstimator(model, chunk_frames=40, hop_frames=20,
                                batch_chunks=4)
    masks2, activity2 = cme2(params, obs_stft, np.asarray(ex['auxInput']))
    np.testing.assert_allclose(masks, masks2, atol=1e-5)
    np.testing.assert_allclose(activity, activity2, atol=1e-5)


def test_host_shard_dataset():
    from tssep_tpu.data.pipeline import new
    from tssep_tpu.dist.multihost import host_shard_dataset
    ds = new(list(range(10)))
    # default equalize=True: every host gets floor(10/3)=3 (tail dropped)
    shards = [list(host_shard_dataset(ds, 3, i)) for i in range(3)]
    assert shards[0] == [0, 3, 6]
    assert shards[1] == [1, 4, 7]
    assert shards[2] == [2, 5, 8]
    # equalize=False keeps the ragged round-robin share
    shards = [list(host_shard_dataset(ds, 3, i, equalize=False))
              for i in range(3)]
    assert shards[0] == [0, 3, 6, 9]
    assert sum(len(s) for s in shards) == 10


def test_calibrate_threshold():
    from tssep_tpu.eval.driver import calibrate_threshold
    rng = np.random.RandomState(0)
    refs = [rng.rand(3, 200) > 0.7 for _ in range(3)]
    # scores: ref + noise, centered around 0.3 -> best threshold well below 0.5
    acts = [0.25 + 0.2 * r + 0.05 * rng.randn(*r.shape) for r in refs]
    th, d = calibrate_threshold(acts, refs, smooth_kernel=1)
    assert 0.2 < th < 0.5
    assert d < 0.2


def test_calibration_stats_additive():
    """The per-threshold stats are the additive cross-host sufficient
    statistic: summing two hosts' stats == computing on the union."""
    from tssep_tpu.eval.driver import calibrate_threshold, calibration_stats
    rng = np.random.default_rng(0)
    refs = [rng.random((2, 60)) > 0.5 for _ in range(4)]
    acts = [0.8 * r + 0.2 * rng.random(r.shape) for r in refs]
    ths_a, err_a, tot_a = calibration_stats(acts[:2], refs[:2],
                                            smooth_kernel=1)
    ths_b, err_b, tot_b = calibration_stats(acts[2:], refs[2:],
                                            smooth_kernel=1)
    ths_u, err_u, tot_u = calibration_stats(acts, refs, smooth_kernel=1)
    np.testing.assert_allclose(err_a + err_b, err_u, atol=1e-9)
    np.testing.assert_allclose(tot_a + tot_b, tot_u, atol=1e-9)
    # single-process cross_host path is a no-op
    th1, d1 = calibrate_threshold(acts, refs, smooth_kernel=1,
                                  cross_host=True)
    th2, d2 = calibrate_threshold(acts, refs, smooth_kernel=1,
                                  cross_host=False)
    assert (th1, d1) == (th2, d2)


def test_host_shard_equalizes_batch_counts():
    """Every host gets floor(N/n) examples so per-host BATCH counts match
    (one collective per batch on pods — a ragged share would deadlock)."""
    from tssep_tpu.data import pipeline
    from tssep_tpu.dist.multihost import host_shard_dataset
    ds = pipeline.new(list(range(15)))
    shares = [list(host_shard_dataset(ds, n_processes=2, index=i))
              for i in range(2)]
    assert [len(s) for s in shares] == [7, 7]       # 15 -> 7 each, 1 dropped
    assert shares[0] == [0, 2, 4, 6, 8, 10, 12]
    assert shares[1] == [1, 3, 5, 7, 9, 11, 13]
    # batch counts equal under drop_last batching
    counts = [len(list(host_shard_dataset(ds, 2, i).batch(4, drop_last=True)))
              for i in range(2)]
    assert counts == [1, 1]
    # opt-out keeps the full round-robin share
    assert len(list(host_shard_dataset(ds, 2, 0, equalize=False))) == 8
