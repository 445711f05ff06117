"""Eval-stack tests: beamformer quality on the spatial toy example, WPE,
metrics, distortion masks.

Quality bars derive from the reference doctest goldens
(``enhancer.py:374-420``: ClassicBF toy mir_eval SDR 8.47/8.59 dB from
~3.2/-1.8 dB input).  Our CACG sampler consumes RNG differently than
pb_bss's, so exact values differ; the bars assert the same *quality class*
(large SDR gain, exact VAD gating).
"""

import numpy as np
import pytest

from tssep_tpu.data.dummy import simple_toy_example, wiener_like_mask
from tssep_tpu.eval.beamformer import (
    apply_beamforming_vector, get_bf_vector, get_psd,
)
from tssep_tpu.eval.classic_bf import ClassicBF, OneMinus, SumCrossTalker
from tssep_tpu.eval.metrics import bss_eval_sources_sdr, ci_sdr, der, si_sdr
from tssep_tpu.eval.wpe import WPE, ChannelWiseWPE, wpe
from tssep_tpu.signal.intervals import ArrayInterval
from tssep_tpu.signal.stft import STFT


class TestDistortionMasks:
    def test_one_minus(self):
        m = np.array([0, 0.5, 1.0])[None]
        out = OneMinus()(m)
        np.testing.assert_allclose(out, [[0, 0.5, 1], [1, 0.5, 0]])

    def test_sum_cross_talker_golden(self):
        # reference enhancer_distortion_mask.py doctest
        m = np.array([[0, 0.2, 0.8, 1, 0], [0.1, 0, 0.5, 1, 0],
                      [1, 0.1, 1, 0.5, 0]])[None, :, :, None]
        out = np.squeeze(SumCrossTalker(eps=0.01)(m))
        np.testing.assert_allclose(out[0], m[0, :, :, 0])
        np.testing.assert_allclose(
            out[1],
            [[1.1, 0.1, 1.5, 1.5, 0.01],
             [1.0, 0.3, 1.8, 1.5, 0.01],
             [0.1, 0.2, 1.3, 2.0, 0.01]], atol=1e-12)


class TestClassicBF:
    @pytest.fixture(scope='class')
    def toy(self):
        return simple_toy_example(frequency_bins=17)

    def test_output_activity_matches_vad(self, toy):
        enh = ClassicBF()
        est = enh(toy['mask'][:-1, None, :, :], toy['Observation'],
                  toy['Vad'])
        assert est.shape == (2, 79, 17)
        assert est.dtype == np.complex128
        active = [ArrayInterval(np.abs(e).sum(axis=-1) != 0) for e in est]
        assert active[0].normalized_intervals == ((0, 55),)
        assert active[1].normalized_intervals == ((45, 79),)

    def test_sdr_improvement(self, toy):
        stft = STFT(size=32, shift=32, window='boxcar')
        enh = ClassicBF()
        est = enh(toy['mask'][:-1, None, :, :], toy['Observation'],
                  toy['Vad'])
        speech_source = stft.istft(toy['Speech_reverberation_early'][:, 0])
        est_t = stft.istft(est)
        in_sdr = bss_eval_sources_sdr(
            speech_source, np.broadcast_to(
                stft.istft(toy['Observation'])[0], speech_source.shape))
        out_sdr = bss_eval_sources_sdr(speech_source, est_t)
        # reference-class gain: input ~3/-2 dB -> output ~8.5 dB
        assert out_sdr.min() > 6.0, (in_sdr, out_sdr)
        assert out_sdr.min() > in_sdr.min() + 5.0

    # Quality bars: mvdr_souden/wmwf are the reference-pinned paths; the
    # GEV variants reach mvdr-class SDR via the Rn·w ATF estimate with
    # whitening loading (see ``beamformer.gev``) — bars pinned to
    # measured 13.9/13.5 dB minus margin.
    @pytest.mark.parametrize('bf,min_sdr', [
        ('mvdr_souden', 5.0), ('wmwf', 5.0),
        ('rank1_gev+mvdr_souden', 9.0), ('scaled_gev_atf+mvdr', 9.0)])
    def test_all_beamformers_run(self, toy, bf, min_sdr):
        enh = ClassicBF(bf=bf)
        est = enh(toy['mask'][:-1, None, :, :], toy['Observation'],
                  toy['Vad'])
        assert np.isfinite(est).all()
        stft = STFT(size=32, shift=32, window='boxcar')
        speech_source = stft.istft(toy['Speech_reverberation_early'][:, 0])
        out_sdr = bss_eval_sources_sdr(speech_source, stft.istft(est))
        assert out_sdr.min() > min_sdr, (bf, out_sdr)

    def test_channel_selection(self, toy):
        enh = ClassicBF(bf='ch0')
        est = enh(toy['mask'][:1, None, :, :],
                  toy['Observation'][:2],  # <6 mics allowed for ch0
                  toy['Vad'][:1])
        np.testing.assert_allclose(
            est[0, 0:55], toy['Observation'][0, 0:55], atol=1e-12)

    def test_masking_floor(self, toy):
        enh = ClassicBF(masking=True, masking_eps=0.1)
        est = enh(toy['mask'][:-1, None, :, :], toy['Observation'],
                  toy['Vad'])
        assert np.isfinite(est).all()


class TestMVDRDirect:
    def test_mvdr_reduces_interference(self):
        toy = simple_toy_example(frequency_bins=17)
        obs = np.transpose(toy['Observation'], (2, 0, 1))  # f, d, t
        masks = np.transpose(toy['mask'], (0, 2, 1))       # src, f, t
        psd_t = get_psd(masks[0], obs)
        psd_n = get_psd(masks[1] + masks[2], obs)
        w = get_bf_vector('mvdr_souden', psd_t, psd_n, ref_channel=0)
        enh = apply_beamforming_vector(w, obs)
        assert enh.shape == (17, 79)
        # distortionless-ish: target segment power preserved vs mixture
        assert np.isfinite(enh).all()


class TestWPE:
    def test_shapes_and_finite(self):
        rng = np.random.RandomState(0)
        y = rng.normal(size=(3, 40, 5)) + 1j * rng.normal(size=(3, 40, 5))
        z = WPE()(y)
        assert z.shape == (3, 40, 5)
        assert np.isfinite(z).all()

    def test_channelwise(self):
        rng = np.random.RandomState(0)
        y = rng.normal(size=(3, 40, 5))
        z = ChannelWiseWPE()(y)
        assert z.shape == (3, 40, 5)

    def test_reduces_late_reverb(self):
        """Synthetic: source + delayed copy (y = s + a*s[t-5]); with white s
        the tail is predictable from delayed observations up to the geometric
        residual a^k where 5k exceeds the tap span — WPE must reach it."""
        rng = np.random.RandomState(1)
        f, d, t = 4, 2, 400
        s = rng.normal(size=(f, d, t)) + 1j * rng.normal(size=(f, d, t))
        a = 0.5
        y = s.copy()
        y[..., 5:] += a * s[..., :-5]
        z = wpe(y, taps=10, delay=2, iterations=3)
        err_before = np.linalg.norm(y - s)
        err_after = np.linalg.norm(z - s)
        # taps cover lags 2..11 -> usable lags 5,10 -> residual ~ a^2/a = a
        assert err_after < 0.6 * err_before, (err_before, err_after)


class TestMetrics:
    def test_si_sdr_perfect(self):
        x = np.random.RandomState(0).randn(1000)
        assert si_sdr(x, 3 * x) > 100

    def test_si_sdr_silent_estimate_is_neg_inf(self):
        """A silent estimate is a catastrophic failure, NOT 0.0 dB (the
        round-3 rehearsal failure hid behind exactly that 0.0)."""
        x = np.random.RandomState(0).randn(1000)
        assert si_sdr(x, np.zeros_like(x)) == -np.inf
        # batched: only the silent row is -inf
        vals = si_sdr(np.stack([x, x]), np.stack([x, np.zeros_like(x)]))
        assert vals[0] > 100 and vals[1] == -np.inf

    def test_degenerate_problems(self):
        from tssep_tpu.eval.run import degenerate_problems
        # healthy eval -> no problems
        assert degenerate_problems(
            {'threshold': 0.4, 'der': 0.1}, {'mean_der': 0.12},
            [{'si_sdr': 5.0}]) == []
        # the three round-3 failure modes each produce a reason
        p = degenerate_problems(
            {'threshold': 0.05, 'der': 1.0, 'degenerate': True},
            {'mean_der': 1.0},
            [{'degenerate': True}, {'degenerate': True}])
        assert len(p) == 3
        assert any('calibration' in s for s in p)
        assert any('mean eval DER' in s for s in p)
        assert any('silent' in s for s in p)


    def test_ci_sdr_invariant_to_short_filter(self):
        rng = np.random.RandomState(0)
        s = rng.randn(8000)
        h = rng.randn(64) * np.exp(-np.arange(64) / 8)
        import scipy.signal
        filtered = scipy.signal.fftconvolve(s, h)[:8000]
        assert ci_sdr(s, filtered) > 40
        assert ci_sdr(s, rng.randn(8000)) < 5

    def test_der_perfect_and_mismatch(self):
        ref = np.zeros((2, 100), dtype=bool)
        ref[0, :50] = True
        ref[1, 40:90] = True
        assert der(ref, ref)['der'] == 0.0
        # swapped speakers still zero (optimal mapping)
        assert der(ref, ref[::-1])['der'] == 0.0
        hyp = ref.copy()
        hyp[0, 50:60] = True  # 10 frames false alarm
        r = der(ref, hyp)
        np.testing.assert_allclose(r['der'], 10 / 100, atol=1e-9)
        r2 = der(ref, np.zeros_like(ref))
        np.testing.assert_allclose(r2['der'], 1.0)

    def test_der_collar(self):
        ref = np.zeros((1, 100), dtype=bool)
        ref[0, 20:60] = True
        hyp = np.zeros((1, 100), dtype=bool)
        hyp[0, 22:60] = True  # 2-frame miss at the boundary
        assert der(ref, hyp)['der'] > 0
        assert der(ref, hyp, collar=3)['der'] == 0.0


def test_wiener_like_mask():
    sigs = np.array([[1.0, 0.0], [1.0, 2.0]])[:, None, :]
    m = wiener_like_mask(sigs, sensor_axis=1)
    np.testing.assert_allclose(m[:, 0], [0.5, 0.5])
    np.testing.assert_allclose(m[:, 1], [0.0, 1.0])


def test_bss_eval_permutation_mode():
    """compute_permutation recovers swapped estimates (weak #5 fix)."""
    from tssep_tpu.eval.metrics import bss_eval_sources_sdr
    rng = np.random.default_rng(0)
    refs = rng.normal(size=(2, 4000))
    ests = np.stack([refs[1] + 0.01 * rng.normal(size=4000),
                     refs[0] + 0.01 * rng.normal(size=4000)])
    plain = bss_eval_sources_sdr(refs, ests, taps=32)
    assert plain.max() < 5  # mismatched order scores badly
    perm_sdr, perm = bss_eval_sources_sdr(
        refs, ests, taps=32, compute_permutation=True,
        return_permutation=True)
    assert list(perm) == [1, 0]
    assert perm_sdr.min() > 20


class TestWPEJax:
    def test_parity_with_numpy(self):
        """On-device (real-block) WPE matches the host implementation."""
        from tssep_tpu.eval.wpe import wpe, wpe_jax
        rng = np.random.RandomState(3)
        f, d, t = 5, 3, 120
        s = rng.normal(size=(f, d, t)) + 1j * rng.normal(size=(f, d, t))
        y = s.copy()
        y[..., 4:] += 0.6 * s[..., :-4]
        ref = wpe(y, taps=8, delay=2, iterations=2)
        out = wpe_jax(y, taps=8, delay=2, iterations=2)
        assert out.shape == y.shape
        # f32 device math vs f64 host math
        np.testing.assert_allclose(out, ref, rtol=0, atol=5e-3)

    def test_reduces_late_reverb_on_device(self):
        from tssep_tpu.eval.wpe import wpe_jax
        rng = np.random.RandomState(1)
        f, d, t = 4, 2, 400
        s = rng.normal(size=(f, d, t)) + 1j * rng.normal(size=(f, d, t))
        y = s.copy()
        y[..., 5:] += 0.5 * s[..., :-5]
        z = wpe_jax(y, taps=10, delay=2, iterations=3)
        assert np.linalg.norm(z - s) < 0.6 * np.linalg.norm(y - s)

    def test_tuple_device_form(self):
        import jax.numpy as jnp
        from tssep_tpu.eval.wpe import wpe_jax
        rng = np.random.RandomState(0)
        y = rng.normal(size=(3, 2, 50)) + 1j * rng.normal(size=(3, 2, 50))
        xr, xi = wpe_jax((jnp.asarray(y.real, jnp.float32),
                          jnp.asarray(y.imag, jnp.float32)), taps=4)
        assert xr.shape == y[..., :].shape and xi.shape == y.shape

    def test_wrapper_backend_jax(self):
        from tssep_tpu.eval.wpe import WPE
        rng = np.random.RandomState(0)
        y = rng.normal(size=(3, 40, 5)) + 1j * rng.normal(size=(3, 40, 5))
        ref = WPE(taps=4)(y)
        out = WPE(taps=4, backend='jax')(y)
        assert out.shape == y.shape
        np.testing.assert_allclose(out, ref, atol=5e-3)
