"""Kaldi-compliance MFCC (reference ``feature_extractor.py:370-427`` wraps
``torchaudio.compliance.kaldi.mfcc``; this is the native rebuild).

torchaudio is not installable here, so parity is anchored three ways:
analytic invariants of the Kaldi definition (frame count, window, DCT
orthonormality, the constant-signal closed form), numpy-vs-JAX agreement,
and pinned golden values of a seeded signal (regression guard).
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from tssep_tpu.features.kaldi import (
    EPSILON, FuncFeature, KaldiMFCC, kaldi_mel_banks, povey_window,
)


def test_frame_count_and_shapes():
    fe = KaldiMFCC()
    assert fe.window_size == 400
    assert fe.window_shift == 160
    assert fe.padded_window_size == 512
    assert fe.num_frames(16000) == 1 + (16000 - 400) // 160  # 98
    x = np.random.RandomState(0).randn(16000)
    feats = fe(x)
    assert feats.shape == (98, 13)
    assert feats.dtype == np.float32
    # batched input
    feats2 = fe(np.stack([x, x]))
    assert feats2.shape == (2, 98, 13)
    np.testing.assert_allclose(feats2[0], feats, rtol=1e-6)


def test_povey_window():
    w = povey_window(400)
    # non-periodic Hann ** 0.85: endpoints 0, symmetric, peak 1 in middle
    assert w[0] == 0 and w[-1] < 1e-10
    np.testing.assert_allclose(w, w[::-1], atol=1e-12)
    hann = 0.5 - 0.5 * np.cos(2 * math.pi * np.arange(400) / 399)
    np.testing.assert_allclose(w, hann ** 0.85, atol=1e-12)


def test_mel_banks_kaldi_semantics():
    banks = kaldi_mel_banks(23, 512, 16000.0)
    assert banks.shape == (23, 256)  # Nyquist bin excluded
    assert (banks >= 0).all() and banks.max() <= 1.0
    # triangles tile the mel axis: interior FFT bins sum close to 1
    cover = banks.sum(0)
    interior = cover[(np.arange(256) * 16000 / 512 > 300)
                     & (np.arange(256) * 16000 / 512 < 7000)]
    assert interior.min() > 0.5 and interior.max() <= 1.0 + 1e-6
    # 40-bin variant used by the real recipe
    banks40 = kaldi_mel_banks(40, 512, 16000.0)
    assert banks40.shape == (40, 256)


def test_constant_signal_closed_form():
    """DC removal zeroes a constant frame -> power spectrum 0 -> all mel
    energies floored at eps -> c0 = log(eps)*sqrt(num_mel_bins), rest 0."""
    fe = KaldiMFCC()
    feats = fe(np.full(800, 3.25))
    expect_c0 = math.log(EPSILON) * math.sqrt(23)
    np.testing.assert_allclose(feats[:, 0], expect_c0, rtol=1e-5)
    np.testing.assert_allclose(feats[:, 1:], 0.0, atol=1e-4)


def test_numpy_jax_parity():
    x = np.random.RandomState(7).randn(4000).astype(np.float32)
    fe = KaldiMFCC()
    ref = fe(x)
    got = np.asarray(fe(jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_golden_values():
    """Pinned regression values (seeded deterministic input)."""
    t = np.arange(1600) / 16000.0
    x = np.sin(2 * np.pi * 440 * t) + 0.1 * np.cos(2 * np.pi * 1330 * t)
    feats = KaldiMFCC()(x)
    assert feats.shape == (8, 13)
    got = feats.mean(0)
    # fmt: off
    golden = np.array([
        -40.87226, 76.98644, -12.94643, -61.39536, -1.79407,
        9.7329, -83.59234, -134.92647, -57.87252, 51.15292,
        73.48902, 20.61532, -13.81434,
    ])
    # fmt: on
    if not np.allclose(got, golden, atol=2e-3):
        raise AssertionError(f'golden mismatch:\n{got!r}\nvs\n{golden!r}')


def test_use_energy_and_subtract_mean():
    x = np.random.RandomState(1).randn(2000)
    fe = KaldiMFCC(use_energy=True)
    feats = fe(x)
    assert feats.shape[-1] == 13
    # c0 replaced by raw log energy (positive for unit-variance frames)
    raw = KaldiMFCC()(x)
    assert not np.allclose(feats[:, 0], raw[:, 0])
    np.testing.assert_allclose(feats[:, 1:], raw[:, 1:], rtol=1e-5)

    fe2 = KaldiMFCC(subtract_mean=True)
    feats2 = fe2(x)
    np.testing.assert_allclose(feats2.mean(0), 0.0, atol=1e-4)


def test_model_forward_with_kaldi_fe():
    """KaldiMFCC as the Model's fe: the waveform branch of forward
    (reference model.py:510-513, Kaldi-input TS-VAD eval)."""
    import jax
    from tssep_tpu.tasks.model import Model

    model = Model.new({
        'fe': {'factory': 'tssep_tpu.features.kaldi.KaldiMFCC',
               'sample_frequency': 8000.0, 'num_ceps': 13,
               'num_mel_bins': 23},
        'reader': {'sample_rate': 8000, 'aux_size': 33},
        'loss': {'factory': 'tssep_tpu.tasks.losses.VADSigmoidBCE'},
        'mask_estimator': {
            'idim': 13, 'odim': 1, 'units': 2, 'projs': 3,
            'aux_net_output_size': 33, 'num_averaged_permutations': 1,
            'output_resolution': 't',
        },
    })
    assert not hasattr(model.fe, 'stft')
    params = model.init_params(jax.random.PRNGKey(0))
    ds = model.prepare_validate_dataset(prefetch=False, batch_size=2)
    ex = next(iter(ds))
    arrays = {k: v for k, v in ex.items()
              if hasattr(v, 'shape') or k == 'reference_channel'}
    out = model.forward(params, arrays, rng=jax.random.PRNGKey(1))
    n_frames = model.fe.num_frames(8000 * 5)
    assert out.logit.shape[:1] == (2,)
    assert out.logit.shape[-2] == n_frames
    assert out.stft_estimate is None


def test_func_feature_wrapper():
    fe = FuncFeature(lambda x: 2.0 * x, KaldiMFCC())
    x = np.random.RandomState(3).randn(1200)
    np.testing.assert_allclose(fe(x), 2.0 * KaldiMFCC()(x), rtol=1e-6)
    assert fe.output_size == 13
    assert not hasattr(fe, 'stft')


def test_reference_config_alias():
    """A reference-format factory config resolves to the native class."""
    import tssep_tpu.compat.aliases  # noqa: F401
    from tssep_tpu.config.configurable import from_config
    fe = from_config({
        'factory': 'tssep.train.feature_extractor.KaldiTorchMFCC',
        'num_ceps': 40, 'num_mel_bins': 40, 'snip_edges': True,
    })
    assert isinstance(fe, KaldiMFCC)
    assert fe.output_size == 40
