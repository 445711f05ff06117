"""Native C++ runtime tests: WAV codec, shard store, interval/DER kernels."""

import numpy as np
import pytest

from tssep_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native runtime not built')


class TestWav:
    def test_roundtrip_pcm16(self, tmp_path):
        rng = np.random.RandomState(0)
        x = (rng.rand(2, 16000).astype(np.float32) - 0.5)
        p = tmp_path / 'a.wav'
        native.wav_write(p, x, 16000)
        y, sr = native.wav_read(p)
        assert sr == 16000
        assert y.shape == (2, 16000)
        np.testing.assert_allclose(y, x, atol=1 / 32000)

    def test_roundtrip_float(self, tmp_path):
        rng = np.random.RandomState(1)
        x = rng.randn(1, 8000).astype(np.float32)
        p = tmp_path / 'f.wav'
        native.wav_write(p, x, 8000, as_float=True)
        y, sr = native.wav_read(p)
        np.testing.assert_array_equal(y, x)

    def test_partial_read(self, tmp_path):
        x = np.arange(1000, dtype=np.float32)[None] / 1000
        p = tmp_path / 'p.wav'
        native.wav_write(p, x, 16000, as_float=True)
        y, _ = native.wav_read(p, start=100, count=50)
        np.testing.assert_array_equal(y[0], x[0, 100:150])

    def test_info(self, tmp_path):
        p = tmp_path / 'i.wav'
        native.wav_write(p, np.zeros((3, 123), np.float32), 44100)
        info = native.wav_info(p)
        assert info['channels'] == 3
        assert info['num_frames'] == 123
        assert info['sample_rate'] == 44100


class TestShard:
    def test_roundtrip(self, tmp_path):
        p = tmp_path / 'data.shard'
        rng = np.random.RandomState(0)
        arrays = {
            'ex0/observation': rng.randn(2, 1000).astype(np.float32),
            'ex0/vad': (rng.rand(8, 1000) > 0.5),
            'ex0/aux': rng.randn(8, 100).astype(np.float32),
            'ex1/observation': rng.randn(2, 500).astype(np.float32),
            'ex1/stft': (rng.randn(10, 5) + 1j * rng.randn(10, 5)
                         ).astype(np.complex64),
        }
        with native.ShardWriter(p) as w:
            for k, v in arrays.items():
                w.add(k, v)
        r = native.ShardReader(p)
        assert set(r.keys()) == set(arrays)
        for k, v in arrays.items():
            got = r[k]
            if v.dtype == np.bool_:
                np.testing.assert_array_equal(got.astype(bool), v)
            else:
                np.testing.assert_array_equal(got, v)


class TestIntervalKernels:
    def test_intervals_from_array(self):
        arr = np.zeros(100, dtype=bool)
        arr[5:20] = True
        arr[50:60] = True
        arr[99] = True
        got = native.intervals_from_array(arr)
        np.testing.assert_array_equal(got, [[5, 20], [50, 60], [99, 100]])

    def test_der_matches_python(self):
        rng = np.random.RandomState(0)
        ref = rng.rand(3, 500) > 0.6
        hyp = rng.rand(3, 500) > 0.6
        ov = native.overlap_matrix(ref, hyp)
        import scipy.optimize
        ri, hi = scipy.optimize.linear_sum_assignment(-ov)
        mapping = np.full(3, -1, dtype=np.int64)
        for r, h in zip(ri, hi):
            mapping[h] = r
        counts = native.der_counts(ref, hyp, mapping)
        native_der = (counts['miss'] + counts['falarm'] +
                      counts['confusion']) / counts['total']
        from tssep_tpu.eval.metrics import der
        py = der(ref, hyp)
        np.testing.assert_allclose(native_der, py['der'], atol=1e-12)
