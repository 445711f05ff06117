"""Training-time enhancers: mask -> STFT estimate (reference
``tssep/train/enhancer.py:21-265``), JAX-native and differentiable.

``Masking`` (the training enhancer) multiplies the reference-channel
observation with the estimated mask.  ``SoudenMVDR`` is the differentiable
on-device MVDR (reference ``TorchBF``): masked PSDs via einsum, a linear
solve, trace normalization — complex64 on TPU with optional diagonal loading
(the reference runs complex128 on CPU; the f64 parity path lives in
``tssep_tpu.eval.beamformer``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tssep_tpu.config.configurable import Configurable

__all__ = ['Enhancer', 'Dummy', 'Nothing', 'Masking', 'SoudenMVDR', 'TorchBF']


def _ref_channel_obs(masks, ex):
    """Select the reference channel of ``ex['Observation']``."""
    reference_channel = ex['reference_channel']
    observation = ex['Observation']
    batched = {4: False, 5: True}[masks.ndim]
    if reference_channel is None:
        assert observation.ndim == (3 if batched else 2), observation.shape
        return observation
    assert observation.ndim == (4 if batched else 3), observation.shape
    return observation[..., reference_channel, :, :]


class Enhancer(Configurable):
    @property
    def name(self):
        return type(self).__name__

    def __call__(self, masks, ex, model):
        raise NotImplementedError


class Dummy(Enhancer):
    def __call__(self, masks, ex, model):
        return None


class Nothing(Enhancer):
    """Pass the observation through unchanged (mask ignored)."""

    def __call__(self, masks, ex, model):
        obs = _ref_channel_obs(masks, ex)
        return obs[..., None, :, :]


class Masking(Enhancer):
    """``Observation[ref] * mask`` — the standard training-time enhancer."""

    def __call__(self, masks, ex, model):
        obs = _ref_channel_obs(masks, ex)
        return obs[..., None, :, :] * jnp.squeeze(masks, axis=-3)

    def re_im(self, masks, ex, model):
        """(re, im) of the masked STFT without forming the complex
        product: the mask is real, so ``real(obs * m) == real(obs) * m``
        — exact in f32, and under the bf16 head policy the products are
        formed directly in bf16 (the ISTFT quantized its inputs to bf16
        anyway).  Feeds ``STFT.istft`` for the training time-domain
        estimate; the complex ``stft_estimate`` then becomes dead code in
        the jitted loss and XLA removes it (it is still produced for
        snapshot forwards)."""
        obs = _ref_channel_obs(masks, ex)
        m = jnp.squeeze(masks, axis=-3)
        re = jnp.real(obs)[..., None, :, :].astype(m.dtype)
        im = jnp.imag(obs)[..., None, :, :].astype(m.dtype)
        return re * m, im * m


class SoudenMVDR(Enhancer):
    """Differentiable MVDR (Souden) beamformer from estimated masks.

    masks: (..., spk, nmask, time, freq) with nmask==1 (interference mask =
    1 - target) or nmask==2 (explicit interference mask).
    Observation: (..., mic, time, freq) complex.
    Returns (..., spk, time, freq).
    """

    def __init__(self, bf='mvdr_souden', masking=False, masking_eps=0.0,
                 eps=None, diagonal_loading=0.0):
        assert bf == 'mvdr_souden', bf
        self.bf = bf
        self.masking = masking
        self.masking_eps = masking_eps
        self.eps = eps
        self.diagonal_loading = diagonal_loading

    def __call__(self, masks, ex, model):
        observation = ex['Observation']
        reference_channel = ex['reference_channel']
        cdtype = observation.dtype

        if masks.shape[-3] == 2:
            m = masks.astype(cdtype)
            psds = jnp.einsum('...kmtf,...dtf,...Dtf->...mkfdD',
                              m, observation, observation.conj())
            target_psd = psds[..., 0, :, :, :, :]
            interference_psd = psds[..., 1, :, :, :, :]
        elif masks.shape[-3] == 1:
            m = jnp.squeeze(masks, axis=-3).astype(cdtype)
            target_psd = jnp.einsum('...ktf,...dtf,...Dtf->...kfdD',
                                    m, observation, observation.conj())
            interference_psd = jnp.einsum('...ktf,...dtf,...Dtf->...kfdD',
                                          1 - m, observation,
                                          observation.conj())
        else:
            raise ValueError(masks.shape)

        if self.diagonal_loading:
            d = observation.shape[-3]
            tr = jnp.trace(interference_psd, axis1=-2, axis2=-1).real
            eye = jnp.eye(d, dtype=cdtype)
            interference_psd = interference_psd + (
                self.diagonal_loading * tr[..., None, None] / d) * eye

        phi = jnp.linalg.solve(interference_psd, target_psd)
        lambda_ = jnp.trace(phi, axis1=-2, axis2=-1)[..., None, None]
        eps = (np.finfo(np.float32).tiny if self.eps is None else self.eps)
        mat = phi / jnp.maximum(lambda_.real, eps)
        beamformer = mat[..., reference_channel]
        enh = jnp.einsum('...kfd,...dtf->...ktf', beamformer.conj(),
                         observation)
        if self.masking:
            enh = enh * jnp.maximum(masks[..., :, 0, :, :], self.masking_eps)
        return enh


#: Reference-compatible alias (the torch reference names this TorchBF).
TorchBF = SoudenMVDR
