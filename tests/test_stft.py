"""Signal-core parity tests.

Golden values come from the reference's doctests
(``/root/reference/tssep/train/feature_extractor.py:194-204`` etc.).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tssep_tpu.signal.stft import (
    STFT, samples_to_frames, sample_index_to_frame_index,
    frame_index_to_sample_index,
)
from tssep_tpu.signal.intervals import ArrayInterval, from_str
from tssep_tpu.signal.vad import stft_vad, istft_vad


def test_frame_count_golden():
    # 10_000 samples, size/wl 1024, shift 256, fading -> 43 frames
    assert samples_to_frames(10_000, size=1024, shift=256) == 43
    fe = STFT(size=1024, shift=256)
    assert fe.stft(np.zeros(10_000)).shape == (43, 513)
    # multi-channel
    assert fe.stft(np.zeros((2, 10_000))).shape == (2, 43, 513)


def test_log1p_maxnorm_golden_stats():
    fe = STFT(size=1024, shift=256, window='blackman')
    rng = np.random.RandomState(0)
    S = fe.stft(rng.uniform(0, 1, size=10_000))
    s = np.abs(S)
    s = s * (np.e - 1) / np.amax(s, keepdims=True, axis=(-2, -1))
    f = np.log1p(s)
    assert f.shape == (43, 513)
    np.testing.assert_allclose(np.mean(f), 0.03461471931132962, rtol=1e-10)
    np.testing.assert_allclose(np.min(f), 1.0003006801514706e-06, rtol=1e-8)
    np.testing.assert_allclose(np.max(f), 1.0, rtol=1e-12)
    np.testing.assert_allclose(np.std(f), 0.051645387514742555, rtol=1e-10)


@pytest.mark.parametrize('window,size,shift', [
    ('blackman', 1024, 256),
    ('hann', 1024, 256),
    ('hann', 64, 32),
    ('boxcar', 32, 32),
    ('hann', 512, 128),
])
def test_roundtrip_np(window, size, shift):
    fe = STFT(size=size, shift=shift, window=window)
    rng = np.random.RandomState(3)
    x = rng.randn(3000)
    y = fe.istft(fe.stft(x), num_samples=3000)
    np.testing.assert_allclose(y, x, atol=1e-10)


def test_roundtrip_jax_jit():
    fe = STFT(size=1024, shift=256, window='hann')
    rng = np.random.RandomState(5)
    x = rng.randn(2, 5000).astype(np.float32)
    f = jax.jit(lambda s: fe.istft(fe.stft(s), num_samples=s.shape[-1]))
    y = np.asarray(f(jnp.asarray(x)))
    np.testing.assert_allclose(y, x, atol=2e-5)


def test_jax_matches_numpy():
    fe = STFT(size=256, shift=64, window='blackman')
    rng = np.random.RandomState(7)
    x = rng.randn(2000)
    S_np = fe.stft(x)
    S_jx = np.asarray(fe.stft(jnp.asarray(x, dtype=jnp.float32)))
    np.testing.assert_allclose(S_jx, S_np, atol=1e-3 * np.abs(S_np).max())


def test_stft_grad():
    fe = STFT(size=64, shift=32)
    g = jax.grad(lambda s: jnp.sum(jnp.abs(fe.stft(s)) ** 2))(jnp.ones(500))
    assert np.isfinite(np.asarray(g)).all()
    assert np.linalg.norm(np.asarray(g)) > 0


def test_sample_frame_index_math():
    # Covering-frame middle semantics, no fading:
    # wl=200 shift=50: samples 0..175 step 25 -> frames [0,0,0,0,1,1,2,2]
    got = [int(sample_index_to_frame_index(
        s, window_length=200, shift=50, fading=None)) for s in range(0, 200, 25)]
    assert got == [0, 0, 0, 0, 1, 1, 2, 2]


def test_frame_to_sample_first_last():
    kw = dict(window_length=1024, shift=256, fading=True)
    assert frame_index_to_sample_index(0, mode='first', **kw) == 0
    assert frame_index_to_sample_index(4, mode='first', **kw) == 4 * 256 - 768
    # 'last' of exclusive frame index f = end of frame f-1
    assert (frame_index_to_sample_index(10, mode='last', **kw)
            == 9 * 256 + 1024 - 768)


class TestArrayInterval:
    def test_from_str_and_invert(self):
        ai = from_str('0:55', shape=79)
        assert ai.normalized_intervals == ((0, 55),)
        assert (~ai).normalized_intervals == ((55, 79),)
        assert ai.sum() == 55
        assert len(ai) == 79

    def test_roundtrip_array(self):
        arr = np.zeros(100, dtype=bool)
        arr[10:20] = True
        arr[40:45] = True
        arr[99] = True
        ai = ArrayInterval(arr)
        assert ai.normalized_intervals == ((10, 20), (40, 45), (99, 100))
        np.testing.assert_array_equal(np.asarray(ai), arr)

    def test_setitem_merge(self):
        ai = ArrayInterval([], shape=50)
        ai[0:10] = True
        ai[5:20] = True
        ai[30:40] = True
        assert ai.normalized_intervals == ((0, 20), (30, 40))
        ai[15:35] = False
        assert ai.normalized_intervals == ((0, 15), (35, 40))

    def test_slice(self):
        ai = from_str('10:20,30:40', shape=50)
        sub = ai[15:35]
        assert sub.normalized_intervals == ((0, 5), (15, 20))


class TestVad:
    def test_stft_vad_basic(self):
        v = np.zeros(10_000, dtype=bool)
        v[2000:6000] = True
        fv = stft_vad(v, 1024, 256, True)
        assert len(fv) == 43
        (s, e), = fv.normalized_intervals
        assert 0 < s < e <= 43

    def test_batch_shapes(self):
        v = np.zeros((2, 3, 10_000), dtype=bool)
        v[..., 1000:4000] = True
        fv = stft_vad(v, 1024, 256, True)
        assert fv.shape == (2, 3, 43)

    def test_istft_vad_roundtrip_envelope(self):
        v = np.zeros(10_000, dtype=bool)
        v[2048:6144] = True
        fv = stft_vad(v, 1024, 256, True)
        sv = istft_vad(fv, 1024, 256, True)
        (s, e), = sv.normalized_intervals
        # The sample-domain reconstruction covers the original activity.
        assert s <= 2048 + 1024 and e >= 6144 - 1024
