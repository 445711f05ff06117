"""Streaming inference: exact forward-state continuation + bounded
lookahead (eval/streaming.py)."""

import jax
import numpy as np
import pytest

from tssep_tpu.tasks.model import Model


@pytest.fixture(scope='module')
def setup():
    model = Model.new({
        'fe': {'size': 64, 'shift': 32, 'window_length': 64},
        'reader': {'sample_rate': 4000, 'aux_size': 33},
        'mask_estimator': {'units': 4, 'projs': 5, 'combination': 'mul',
                           'ts_vad': 4, 'aux_net_output_size': 33,
                           'num_averaged_permutations': 1,
                           'output_resolution': 'tf'},
    })
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    samples = rng.randn(4000).astype(np.float32)
    aux = rng.randn(4, 33).astype(np.float32)
    return model, params, samples, aux


def _offline_masks(model, params, feats, aux):
    me = model.mask_estimator
    out = me.apply(params['mask_estimator'], feats[None],
                   np.asarray(aux)[None], rng=None, training=False)
    return np.asarray(out.mask[0])


def _collect(session, samples, block=1500):
    chunks = []
    for i in range(0, len(samples), block):
        for masks, activity in session.process(samples[i:i + block]):
            chunks.append((masks, activity))
    for masks, activity in session.flush():
        chunks.append((masks, activity))
    return chunks


def test_streaming_matches_offline_with_full_lookahead(setup):
    """With lookahead >= the whole utterance every emitted chunk is
    bit-identical to offline inference (fwd states exact, rev sees all
    remaining frames)."""
    from tssep_tpu.eval.streaming import StreamingSession
    model, params, samples, aux = setup
    sess = StreamingSession(model, params, aux, chunk_frames=16,
                            lookahead_frames=1000)
    chunks = _collect(sess, samples)
    streamed = np.concatenate([m for m, _ in chunks], axis=-2)

    # offline reference on the same (causal) frame matrix
    ref_sess = StreamingSession(model, params, aux, chunk_frames=10 ** 6)
    ref_sess._sample_buf = np.concatenate([ref_sess._sample_buf, samples])
    ref_sess._stft_more()
    frames = ref_sess._frame_buf
    feats = ref_sess._features(frames).astype(np.float32)
    offline = _offline_masks(model, params, feats, aux)

    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=2e-5)


def test_streaming_bounded_lookahead_approximates(setup):
    """Small lookahead: latency-bounded output stays close to offline."""
    from tssep_tpu.eval.streaming import StreamingSession
    model, params, samples, aux = setup
    sess = StreamingSession(model, params, aux, chunk_frames=16,
                            lookahead_frames=8)
    chunks = _collect(sess, samples)
    streamed = np.concatenate([m for m, _ in chunks], axis=-2)

    ref_sess = StreamingSession(model, params, aux, chunk_frames=10 ** 6)
    ref_sess._sample_buf = np.concatenate([ref_sess._sample_buf, samples])
    ref_sess._stft_more()
    feats = ref_sess._features(ref_sess._frame_buf).astype(np.float32)
    offline = _offline_masks(model, params, feats, aux)

    assert streamed.shape == offline.shape
    err = np.abs(streamed - offline).mean()
    assert err < 0.1, err  # masks are in [0, 1]


def test_streaming_emission_latency(setup):
    """Chunks are emitted as soon as chunk+lookahead frames exist —
    nothing is buffered beyond the configured latency."""
    from tssep_tpu.eval.streaming import StreamingSession
    model, params, samples, aux = setup
    fe = model.fe
    chunk, look = 8, 4
    sess = StreamingSession(model, params, aux, chunk_frames=chunk,
                            lookahead_frames=look)
    need_samples = (chunk + look - 1) * fe.shift + fe.window_length
    emitted = list(sess.process(samples[:need_samples]))
    assert len(emitted) == 1
    masks, activity = emitted[0]
    assert masks.shape[-2] == chunk
    assert activity.shape == (4, chunk)


def test_streaming_activity_shape_tsvad(setup):
    from tssep_tpu.eval.streaming import StreamingSession
    model, params, samples, aux = setup
    sess = StreamingSession(model, params, aux, chunk_frames=12,
                            lookahead_frames=6)
    chunks = _collect(sess, samples)
    assert len(chunks) >= 2
    for masks, activity in chunks:
        assert masks.ndim == 4           # (S, nmask, T, F)
        assert activity.shape == (4, masks.shape[-2])
        assert np.all(activity >= 0) and np.all(activity <= 1)
