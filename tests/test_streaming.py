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


@pytest.mark.slow
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


@pytest.mark.slow
def test_streaming_audio_bit_parity_with_offline(setup):
    """emit_audio=True: streaming mask-multiply + incremental ISTFT
    overlap-add equals the offline synthesis of the same masked frames
    sample-for-sample (covering lookahead -> identical masks, and the
    OLA tail carry must stitch chunks without seams)."""
    from tssep_tpu.eval.streaming import StreamingSession
    from tssep_tpu.signal.stft import STFT
    model, params, samples, aux = setup
    sess = StreamingSession(model, params, aux, chunk_frames=16,
                            lookahead_frames=1000, emit_audio=True)
    chunks = []
    for i in range(0, len(samples), 1500):
        chunks.extend(sess.process(samples[i:i + 1500]))
    chunks.extend(sess.flush())
    streamed_masks = np.concatenate([m for m, _, _ in chunks], axis=-2)
    streamed_audio = np.concatenate([a for _, _, a in chunks], axis=-1)

    # offline reference on the same causal frame matrix
    ref_sess = StreamingSession(model, params, aux, chunk_frames=10 ** 6)
    ref_sess._sample_buf = np.concatenate([ref_sess._sample_buf, samples])
    ref_sess._stft_more()
    frames = ref_sess._frame_buf
    feats = ref_sess._features(frames).astype(np.float32)
    offline_masks = _offline_masks(model, params, feats, aux)
    np.testing.assert_allclose(streamed_masks, offline_masks, atol=2e-5)

    fe = model.fe
    stft_nofade = STFT(size=fe.size, shift=fe.shift,
                       window_length=fe.window_length, fading=False,
                       window=fe.window)
    masked = offline_masks[:, 0] * frames[None]
    offline_audio = stft_nofade.istft(masked)
    assert streamed_audio.shape == offline_audio.shape
    np.testing.assert_allclose(streamed_audio, offline_audio, atol=2e-5)


def test_streaming_feature_protocol_causal_stats():
    """Per-extractor causal statistics: block-wise streaming features with
    committed-state discipline converge to offline once the running stats
    have seen everything; frame-local extractors are exact; unsupported
    extractors raise."""
    import pytest as _pytest

    from tssep_tpu.features.extractor import (
        AbsIPDSTFT, Log1pAbsSTFT, Log1pMaxNormAbsSTFT, MFCC,
        MVNLog1pAbsSTFT)

    rng = np.random.RandomState(0)
    frames = (rng.randn(40, 33) + 1j * rng.randn(40, 33)).astype(np.complex64)

    # frame-local: exact in any block split
    fe = Log1pAbsSTFT(size=64, shift=32)
    state = fe.init_streaming_state()
    parts = []
    for i in range(0, 40, 7):
        f, state = fe.streaming_feature(frames[i:i + 7], state)
        parts.append(f)
    np.testing.assert_allclose(np.concatenate(parts),
                               fe.stft_to_feature(frames), rtol=1e-6)

    # running max ('tf' and 't'): the last block (with stats having seen
    # all frames) matches offline exactly when the max was seen early
    for axis in ('tf', 't'):
        fe = Log1pMaxNormAbsSTFT(size=64, shift=32, statistics_axis=axis)
        boosted = frames.copy()
        boosted[:7] *= 10  # global max lives in the first block
        state = fe.init_streaming_state()
        parts = []
        for i in range(0, 40, 7):
            f, state = fe.streaming_feature(boosted[i:i + 7], state)
            parts.append(f)
        np.testing.assert_allclose(np.concatenate(parts),
                                   fe.stft_to_feature(boosted), rtol=1e-5)

    # 'f' axis is frame-local exact
    fe = Log1pMaxNormAbsSTFT(size=64, shift=32, statistics_axis='f')
    f, _ = fe.streaming_feature(frames[:7], fe.init_streaming_state())
    np.testing.assert_allclose(f, fe.stft_to_feature(frames[:7]), rtol=1e-6)

    # MVN: running mean, no double counting across blocks
    fe = MVNLog1pAbsSTFT(size=64, shift=32)
    state = fe.init_streaming_state()
    for i in range(0, 40, 10):
        _, state = fe.streaming_feature(frames[i:i + 10], state)
    assert state['count'] == 40
    np.testing.assert_allclose(
        state['sum'] / 40, np.log1p(np.abs(frames)).mean(axis=-2),
        rtol=1e-5)

    # MFCC: causal top-db clamp via running max
    fe = MFCC(size=64, shift=32, n_mfcc=5, n_mels=8, f_max=-8,
              sample_rate=16000)
    state = fe.init_streaming_state()
    parts = []
    boosted = frames.copy()
    boosted[:7] *= 100
    for i in range(0, 40, 7):
        f, state = fe.streaming_feature(boosted[i:i + 7], state)
        parts.append(f)
    np.testing.assert_allclose(np.concatenate(parts),
                               fe.stft_to_feature(boosted), rtol=1e-4,
                               atol=1e-4)

    # unsupported: loud failure, not silent semantics change
    fe = AbsIPDSTFT(size=64, shift=32)
    with _pytest.raises(NotImplementedError):
        fe.streaming_feature(frames[None].repeat(2, 0), None)
