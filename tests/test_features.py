"""Feature-extractor parity tests (goldens from reference doctests)."""

import jax.numpy as jnp
import numpy as np

from tssep_tpu.features.extractor import (
    AbsSTFT, ConcatenatedSTFTFeatures, Log1pAbsSTFT, Log1pMaxNormAbsSTFT,
    MFCC, MVNLog1pAbsSTFT, NoFeatureSTFT, interchannel_phase_differences,
)


def test_log1p_maxnorm_tiny_golden():
    # reference feature_extractor.py:194-196
    fe = Log1pMaxNormAbsSTFT()
    got = fe.stft_to_feature(np.array([[1, 5], [3 + 4j, -5]]))
    np.testing.assert_allclose(
        got, [[0.29539453, 1.0], [1.0, 1.0]], rtol=1e-7)


def test_log1p_maxnorm_full_golden():
    fe = Log1pMaxNormAbsSTFT()
    rng = np.random.RandomState(0)
    f = fe(rng.uniform(0, 1, size=10_000))
    assert f.shape == (43, 513)
    np.testing.assert_allclose(
        [np.mean(f), np.min(f), np.max(f), np.std(f)],
        [0.03461471931132962, 1.0003006801514706e-06, 1.0,
         0.051645387514742555],
        rtol=1e-7)


def test_log1p_abs_golden():
    fe = Log1pAbsSTFT()
    got = fe.stft_to_feature(np.array([[1, 5], [3 + 4j, -5]]))
    np.testing.assert_allclose(
        got, [[0.69314718, 1.79175947], [1.79175947, 1.79175947]], rtol=1e-7)


def test_mvn_golden():
    # reference feature_extractor.py:113-124
    fe = MVNLog1pAbsSTFT()
    got = fe.stft_to_feature(np.array([[1, 5], [3 + 4j, -5]]))
    np.testing.assert_allclose(
        got, [[-0.54930614, 0.0], [0.54930614, 0.0]], atol=1e-7)
    assert fe(np.ones(10_000)).shape == (43, 513)


def test_no_feature():
    fe = NoFeatureSTFT()
    assert fe.output_size == 0
    assert fe.stft_to_feature(np.ones((3, 5))).shape == (3, 0)


def test_ipd_golden():
    # reference feature_extractor.py:37-56
    np.random.seed(0)
    signal = (np.ones([6, 4, 5])
              * np.exp(1j * np.random.uniform(0, 2 * np.pi, [6, 1, 1]))
              * (np.arange(6)[:, None, None] + 1))
    c, s = interchannel_phase_differences(signal)
    np.testing.assert_allclose(
        c[:, 0, 0],
        [0.81966208, 0.76070789, 0.93459697, 0.93459697, 0.72366352,
         0.90670355], rtol=1e-7)
    np.testing.assert_allclose(
        s[:, 0, 0],
        [-0.57284734, 0.64909438, 0.35570844, -0.35570844, -0.69015296,
         -0.42176851], rtol=1e-6)


def test_concatenated():
    # reference feature_extractor.py:293-302
    fe1 = Log1pMaxNormAbsSTFT()
    fe = ConcatenatedSTFTFeatures(fe1, Log1pAbsSTFT())
    got = fe.stft_to_feature(np.array([[1, 5], [3 + 4j, -5]]))
    np.testing.assert_allclose(
        got,
        [[0.29539453, 1.0, 0.69314718, 1.79175947],
         [1.0, 1.0, 1.79175947, 1.79175947]], rtol=1e-7)
    assert fe.output_size == 513 * 2


def test_concatenated_config():
    cfg = ConcatenatedSTFTFeatures.get_config({
        'fe1': {'factory': 'tssep_tpu.features.extractor.MFCC',
                'output_size': 40, 'n_mfcc': 40, 'f_min': 40, 'f_max': -400,
                'n_mels': 40},
        'fe2': {'factory': 'tssep_tpu.features.extractor.Log1pMaxNormAbsSTFT'},
        'size': 512, 'shift': 128, 'window': 'hann',
    })
    # size/shift/window propagated dogmatically into children
    assert cfg['fe1']['size'] == 512
    assert cfg['fe2']['size'] == 512
    assert cfg['fe1']['window'] == 'hann'
    assert cfg['fe2']['window_length'] == 512
    from tssep_tpu.config import from_config
    fe = from_config(cfg)
    assert fe.output_size == 40 + 257


def test_mfcc_shapes_and_finiteness():
    fe = MFCC(size=1024, shift=256, window='hann', sample_rate=16000,
              n_mfcc=40, f_min=40, f_max=-400, n_mels=40)
    assert fe.output_size == 40
    rng = np.random.RandomState(0)
    x = rng.randn(16000)
    f = fe(x)
    assert f.shape == (fe.num_frames(16000), 40)
    assert np.isfinite(f).all()
    # jax path matches numpy path
    fj = np.asarray(fe(jnp.asarray(x, dtype=jnp.float32)))
    np.testing.assert_allclose(fj, f, atol=2e-2)


def test_mfcc_mel_filterbank_properties():
    fe = MFCC(size=1024, sample_rate=16000, f_min=40, f_max=-400, n_mels=40)
    fb = fe.fbank
    assert fb.shape == (513, 40)
    assert (fb >= 0).all()
    # NOTE: the reference config's f_max (sr-400 = 15600) exceeds Nyquist
    # (8000), so upper mel filters have no support — torchaudio merely warns.
    # The filters below Nyquist must have support:
    import tssep_tpu.signal.mel as mel
    centers = mel.mel_to_hz(
        np.linspace(mel.hz_to_mel(40), mel.hz_to_mel(15600), 42))[1:-1]
    assert (fb.sum(axis=0)[centers < 7800] > 0).all()


def test_abs_stft_jax_np_agree():
    fe = AbsSTFT(size=256, shift=64)
    rng = np.random.RandomState(1)
    x = rng.randn(1000)
    a = fe(x)
    b = np.asarray(fe(jnp.asarray(x, dtype=jnp.float32)))
    np.testing.assert_allclose(b, a, atol=1e-3)


def test_ipd_pairing_reproducible():
    """Channel pairing uses an explicit, reseedable RNG (not the numpy
    global RNG) — reproducible IPD features."""
    from tssep_tpu.features.extractor import (
        interchannel_phase_differences, seed_ipd_rng,
    )
    rng = np.random.RandomState(0)
    sig = rng.randn(4, 10, 9) + 1j * rng.randn(4, 10, 9)
    seed_ipd_rng(123)
    try:
        a = interchannel_phase_differences(sig, concatenate=True)
        seed_ipd_rng(123)
        b = interchannel_phase_differences(sig, concatenate=True)
        np.testing.assert_array_equal(a, b)
    finally:
        seed_ipd_rng(None)  # restore reference global-RNG parity default
    # explicit rng param wins
    c = interchannel_phase_differences(
        sig, concatenate=True, rng=np.random.default_rng(7))
    d = interchannel_phase_differences(
        sig, concatenate=True, rng=np.random.default_rng(7))
    np.testing.assert_array_equal(c, d)
