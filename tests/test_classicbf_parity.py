"""Separated-waveform parity: the full eval ``ClassicBF`` path vs an
independent numpy restatement of the reference's ``ClassicBF_np``
(``/root/reference/tssep/train/enhancer.py:451-548`` segment loop,
``:268-289`` masked PSD with the ``(A+A^T)/2`` symmetrization,
``enhancer_distortion_mask.py`` SumCrossTalker, pb_bss's Souden MVDR)
on one fixed 6-mic example — the north-star "separated waveform allclose"
check, WPE off and on.

The restatement below is written directly from the reference's structure
and shares no code with ``tssep_tpu.eval.classic_bf`` /
``tssep_tpu.eval.beamformer`` (except WPE, which is the identical
preprocessing call on both sides and carries its own parity tests).
The final waveform comparison runs through the golden-tested ISTFT.
"""

import numpy as np

from tssep_tpu.eval.classic_bf import ClassicBF
from tssep_tpu.eval.wpe import WPE
from tssep_tpu.signal.intervals import ArrayInterval
from tssep_tpu.signal.stft import STFT


# --------------------------------------------------------------------------
# Independent restatement (reference structure, plain numpy)
# --------------------------------------------------------------------------
def _ref_get_psd(mask, observation, mask_power=1):
    """enhancer.py:268-289: einsum PSD + (A + A^T)/2 symmetrization."""
    if mask_power != 1:
        mask = mask ** mask_power
    psd = np.einsum('...t,...dt,...Dt->...dD', mask, observation,
                    observation.conj()) / observation.shape[-1]
    return (psd + np.swapaxes(psd, -2, -1)) / 2


def _ref_mvdr_souden(psd_target, psd_distortion, ref_channel=0):
    """pb_bss get_bf_vector('mvdr_souden'): w = (Rn^-1 Rx / tr) e_ref,
    with the trace-relative diagonal loading pb_bss applies to Rn."""
    d = psd_distortion.shape[-1]
    loading = (1e-10 * np.einsum('...dd->...', psd_distortion).real
               [..., None, None] / d * np.eye(d))
    phi = np.linalg.solve(psd_distortion + loading, psd_target)
    lam = np.trace(phi, axis1=-2, axis2=-1)[..., None, None].real
    lam = np.maximum(lam, np.finfo(lam.dtype).tiny)
    return (phi / lam)[..., ref_channel]


def _ref_classic_bf(masks, observation, dia, *, masking=False,
                    masking_eps=0, eps=1e-4, pre_wpe=None):
    """enhancer.py:451-548 restated: rearranges, SumCrossTalker, the
    per-(speaker, interval) segment loop, numpy_out stitching.

    masks: (spk, nmask=1, time, freq); observation: (mic, time, freq);
    dia: list of per-speaker ArrayIntervals.  -> (spk, T, F) complex.
    """
    masks = np.asarray(masks, dtype=np.float64)
    observation = np.asarray(observation)
    assert observation.shape[0] >= 6, observation.shape
    if pre_wpe is not None:
        observation = pre_wpe(observation)
    # 'mic time freq -> freq mic time' / 'spk mask time freq -> mask spk freq time'
    observation = np.transpose(observation, (2, 0, 1))
    masks = np.transpose(masks, (1, 0, 3, 2))
    assert masks.shape[0] == 1, masks.shape

    # SumCrossTalker (enhancer_distortion_mask.py): distortion = eps-floored
    # sum of the OTHER speakers' masks
    noise = np.maximum(masks.sum(axis=1, keepdims=True) - masks, eps)
    masks = np.concatenate([masks, noise], axis=0)  # (2, spk, F, T)

    _, K, F, T = masks.shape
    out = np.zeros((K, T, F), dtype=observation.dtype)
    for target_idx, ai in enumerate(dia):
        for s, e in ai.normalized_intervals:
            obs_local = observation[:, :, s:e]
            psd_t, psd_n = _ref_get_psd(masks[:, target_idx, :, s:e],
                                        obs_local)
            w = _ref_mvdr_souden(psd_t, psd_n, ref_channel=0)
            enh = np.einsum('fd,fdt->ft', w.conj(), obs_local).T  # (t, f)
            if masking:
                enh = enh * np.maximum(masks[0, target_idx, :, s:e].T,
                                       masking_eps)
            out[target_idx, s:e, :] = enh
    return out


# --------------------------------------------------------------------------
# Fixed 6-mic fixture
# --------------------------------------------------------------------------
def _example(seed=0, mics=6, spk=3, samples=2560, size=64, shift=32):
    rng = np.random.RandomState(seed)
    stft = STFT(size=size, shift=shift, window='hann', pad=True, fading=True)
    # per-speaker sources with simple per-mic delays+gains -> real spatial
    # structure (a rank-deficient or iid observation makes MVDR degenerate)
    srcs = rng.randn(spk, samples)
    obs = np.zeros((mics, samples))
    for k in range(spk):
        for m in range(mics):
            d = (k + 2 * m) % 7
            obs[m] += np.roll(srcs[k], d) * (1.0 + 0.1 * m + 0.05 * k)
    obs += 0.05 * rng.randn(mics, samples)
    Obs = np.asarray(stft(obs))                     # (mic, T, F) complex
    T, F = Obs.shape[-2:]
    masks = rng.uniform(0.05, 0.95, (spk, 1, T, F))
    act = np.zeros((spk, T), dtype=bool)
    act[0, 2:T - 3] = True
    act[1, 0:T // 2] = True
    act[2, T // 3:T] = True
    dia = [ArrayInterval(a) for a in act]
    return stft, Obs, masks, dia, samples


def test_classicbf_waveform_allclose():
    stft, Obs, masks, dia, samples = _example()
    ours = ClassicBF(bf='mvdr_souden')(masks, Obs, dia)
    ref = _ref_classic_bf(masks, Obs, dia)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)
    # separated WAVEFORMS allclose (f64 through the golden-tested ISTFT)
    w_ours = np.asarray(stft.istft(ours, num_samples=samples))
    w_ref = np.asarray(stft.istft(ref, num_samples=samples))
    assert w_ours.shape == (3, samples)
    np.testing.assert_allclose(w_ours, w_ref, rtol=1e-10, atol=1e-12)
    assert np.abs(w_ours).max() > 1e-3   # non-trivial output


def test_classicbf_waveform_allclose_with_masking_postfilter():
    stft, Obs, masks, dia, samples = _example(seed=1)
    ours = ClassicBF(bf='mvdr_souden', masking=True, masking_eps=0.1)(
        masks, Obs, dia)
    ref = _ref_classic_bf(masks, Obs, dia, masking=True, masking_eps=0.1)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)
    w_ours = np.asarray(stft.istft(ours, num_samples=samples))
    w_ref = np.asarray(stft.istft(ref, num_samples=samples))
    np.testing.assert_allclose(w_ours, w_ref, rtol=1e-10, atol=1e-12)


def test_classicbf_waveform_allclose_wpe_on():
    """WPE-on plumbing: pre_wpe applied to (mic, time, freq) before the
    segment loop on both sides (the WPE implementation itself carries its
    own tests; here it is the identical call)."""
    stft, Obs, masks, dia, samples = _example(seed=2)
    wpe = WPE(taps=4, delay=1, iterations=1)
    ours = ClassicBF(bf='mvdr_souden', pre_wpe=wpe)(masks, Obs, dia)
    ref = _ref_classic_bf(masks, Obs, dia, pre_wpe=wpe)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)
    w_ours = np.asarray(stft.istft(ours, num_samples=samples))
    w_ref = np.asarray(stft.istft(ref, num_samples=samples))
    np.testing.assert_allclose(w_ours, w_ref, rtol=1e-10, atol=1e-12)
