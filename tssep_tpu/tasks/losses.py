"""Training losses (reference ``tssep/train/loss.py``), JAX-native.

Golden values (reference doctests, reproduced in tests with torch fixtures):
MSE 0.1673, MAE 0.5018, LogMAE -0.2995, VADSigmoidBCE 0.3867 / 0 / 0.0111 /
0.4932.

Shapes: time-domain losses get ``estimate/target`` of (B?, spk, samples);
the VAD loss gets logits (B?, spk, time, freq) and frame targets (B?, spk,
time).  All return a per-example loss (B,) for batched input, scalar
otherwise (except MSE/FreqMSE: full mean, matching the reference).

PIT (permutation-invariant training) minimizes over speaker permutations via
a pairwise loss matrix + static permutation enumeration — exact for the
sum/mean-decomposable losses used here, and jit-compatible (no host callbacks).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from tssep_tpu.config.configurable import Configurable

__all__ = [
    'Loss', 'TimeDomain', 'STFTDomain', 'LogitsSTFTDomain',
    'MSE', 'MAE', 'LogMAE', 'FreqMSE', 'VADSigmoidBCE',
    'SignalAndVADSigmoidBCE', 'pit_minimum',
]


def pit_minimum(pairwise, speakers: int):
    """Min over permutations of sum_s pairwise[..., s, perm[s]].

    ``pairwise``: (..., S, S) loss of (estimate s, target t).  Static
    enumeration of permutations (S <= 8 -> max 40320 x S adds).
    """
    perms = list(itertools.permutations(range(speakers)))
    rows = np.arange(speakers)
    vals = jnp.stack(
        [pairwise[..., rows, np.array(p)].sum(axis=-1) for p in perms], axis=-1)
    return vals.min(axis=-1)


class Loss(Configurable):
    """Base loss with the target-naming protocol of the reference
    (``loss.py:17-87``): ``target`` is the example key; capitalized names are
    STFT/frame-domain, lowercase time-domain."""

    def __init__(self, target='speaker_reverberation_early_ch0', pit=False):
        self.target = target
        self.pit = pit

    @property
    def name(self):
        return type(self).__name__

    def targets(self, lower=False, upper=False):
        if lower:
            return (self.target.lower(),)
        if upper:
            return (self.target[0].upper() + self.target[1:],)
        return (self.target,)

    def device_targets(self):
        """Example keys the device-side loss actually reads (the host may
        keep everything else — e.g. sample-domain VAD — off the wire)."""
        return set(self.targets()) | set(self.targets(lower=True))

    def loss_fn(self, estimate, target):
        raise NotImplementedError

    def __call__(self, estimate, target):
        assert estimate.shape == target.shape, (estimate.shape, target.shape)
        if self.pit:
            return self._pit(estimate, target)
        return self.loss_fn(estimate, target)

    def _pit(self, estimate, target):
        # Pairwise per-speaker loss matrix along axis -2 (speakers)
        s = estimate.shape[-2]
        e = jnp.expand_dims(estimate, -2)   # (..., S, 1, T)
        t = jnp.expand_dims(target, -3)     # (..., 1, S, T)
        pw = self.elementwise(e, t).mean(axis=-1)
        return self.reduce_pit(pit_minimum(pw, s))

    def elementwise(self, e, t):
        raise NotImplementedError

    def reduce_pit(self, summed):
        return summed

    def from_ex_out(self, ex, out, model, summary=None):
        raise NotImplementedError


def masked_time_stats(elementwise, sample_mask):
    """Masked mean over time then sum over speakers.

    elementwise: (..., spk, T); sample_mask: broadcastable (..., 1, T) with
    1 on valid samples.
    """
    counts = jnp.maximum(sample_mask.sum(axis=-1), 1.0)
    return (elementwise * sample_mask).sum(axis=-1) / counts


class TimeDomain(Loss):
    def from_ex_out(self, ex, out, model, summary=None):
        # Upcast inside the loss: under TSSEP_HEAD_BF16 the estimate
        # arrives bf16; the difference/abs math must accumulate f32.
        # (XLA fuses the convert into the elementwise chain — no extra
        # HBM materialization.)
        estimate = out.time_estimate.astype(jnp.float32)
        target = ex[self.target]
        mask = ex.get('_sample_mask')
        if mask is not None and not self.pit:
            per_spk = masked_time_stats(self.elementwise(estimate, target),
                                        mask)
            return self.reduce_time_masked(per_spk)
        return self(estimate, target)

    def reduce_time_masked(self, per_spk):
        """Combine per-speaker masked time means (override per loss)."""
        return per_spk.sum(axis=-1)


class STFTDomain(Loss):
    def from_ex_out(self, ex, out, model, summary=None):
        assert self.target[0].isupper(), self.target
        if self.target not in ex:
            ex[self.target] = model.fe.stft(ex[self.target.lower()])
        return self(out.stft_estimate, ex[self.target])


class MSE(TimeDomain):
    """Mean over time, summed over speakers (``pt.ops.mse_loss`` semantics;
    golden 0.1673 on the seeded (2, 10000) fixture)."""

    def loss_fn(self, estimate, target):
        return ((estimate - target) ** 2).mean(axis=-1).sum(axis=-1)

    def elementwise(self, e, t):
        return (e - t) ** 2


class MAE(TimeDomain):
    def loss_fn(self, estimate, target):
        return jnp.abs(estimate - target).mean(axis=-1).sum(axis=-1)

    def elementwise(self, e, t):
        return jnp.abs(e - t)


class LogMAE(TimeDomain):
    """``log10(sum_spk mean_t |e - t|)`` — the TS-SEP training loss."""

    def loss_fn(self, estimate, target):
        return jnp.log10(jnp.abs(estimate - target).mean(axis=-1).sum(axis=-1))

    def elementwise(self, e, t):
        return jnp.abs(e - t)

    def reduce_pit(self, summed):
        return jnp.log10(summed)

    def reduce_time_masked(self, per_spk):
        return jnp.log10(per_spk.sum(axis=-1))


class FreqMSE(STFTDomain):
    def __init__(self, target='Speaker_reverberation_early', pit=False):
        super().__init__(target=target, pit=pit)

    def loss_fn(self, estimate, target):
        d = estimate - target
        sq = jnp.real(d * jnp.conj(d)) if jnp.iscomplexobj(d) else d ** 2
        # mean over time(/freq), summed over speakers (pt.ops.mse_loss)
        if sq.ndim >= 3:
            sq = sq.mean(axis=-1)
        return sq.mean(axis=-1).sum(axis=-1)

    def elementwise(self, e, t):
        d = e - t
        return jnp.real(d * jnp.conj(d)) if jnp.iscomplexobj(d) else d ** 2


def _bce_with_logits(x, z):
    """Numerically stable BCE-with-logits (elementwise)."""
    return jnp.maximum(x, 0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))


class VADSigmoidBCE(Loss):
    """Frame-level voice-activity BCE — the TS-VAD training loss.

    Estimate: logits (B?, spk, time, freq) (frequency axis averaged);
    target: frame activity (B?, spk, time) (from ``Vad``) or derived from a
    magnitude-thresholded target signal.
    """

    def __init__(self, target='Vad', pit=False, magnitude_threshold=0.05):
        super().__init__(target=target, pit=pit)
        assert 0 < magnitude_threshold < 1, magnitude_threshold
        self.magnitude_threshold = magnitude_threshold

    def loss_fn(self, estimate, target):
        return _bce_with_logits(estimate, target).mean(axis=(-1, -2))

    def elementwise(self, e, t):
        return _bce_with_logits(e, t)

    def reduce_pit(self, summed):
        # pairwise already time-averaged; mean over speakers
        return summed / 1

    def device_targets(self):
        # frame-domain 'Vad' only; the sample-domain activity stays host-side
        if self.target in ('vad', 'Vad'):
            return {'Vad'}
        return super().device_targets()

    def prepare_target(self, target, dtype=jnp.float32):
        if self.target in ('vad', 'Vad'):
            return target
        xp = jnp if isinstance(target, jnp.ndarray) else np
        t = xp.abs(target).sum(axis=-1)
        t = t / xp.max(t, axis=-1, keepdims=True)
        return (t > self.magnitude_threshold).astype(dtype)

    def __call__(self, estimate, target):
        if self.target not in ('vad', 'Vad'):
            assert estimate.shape == target.shape, (estimate.shape, target.shape)
            assert estimate.ndim > 2, estimate.shape
            target = self.prepare_target(target)
        estimate = jnp.mean(estimate, axis=-1)
        assert estimate.shape == target.shape, (estimate.shape, target.shape)
        if self.pit:
            s = estimate.shape[-2]
            e = jnp.expand_dims(estimate, -2)
            t = jnp.expand_dims(target, -3)
            pw = _bce_with_logits(e, t).mean(axis=-1)
            return pit_minimum(pw, s) / s
        # mean over (time, speaker) -> per-example loss
        return _bce_with_logits(estimate, target).mean(axis=(-1, -2))

    def from_ex_out(self, ex, out, model, summary=None):
        assert self.target[0].isupper(), self.target
        # 'Vad' frame targets are precomputed host-side (interval math is not
        # traceable); see Model.host_prepare.
        target = ex[self.target]
        estimate = jnp.squeeze(out.logit, axis=-3)  # drop the nmask axis
        frame_mask = ex.get('_frame_mask')
        if frame_mask is not None and not self.pit:
            est = jnp.mean(estimate, axis=-1)
            bce = _bce_with_logits(est, target) * frame_mask
            counts = jnp.maximum(frame_mask.sum(axis=-1), 1.0)
            return (bce.sum(axis=-1) / counts).mean(axis=-1)
        return self(estimate, target)


class SignalAndVADSigmoidBCE(VADSigmoidBCE):
    """Joint signal + VAD loss for ``explicit_vad`` heads (``loss.py:348``)."""

    def __init__(self, signal_loss: TimeDomain, target='Vad', pit=False,
                 magnitude_threshold=0.05, vad_weight=1.0, signal_weight=1.0):
        super().__init__(target=target, pit=pit,
                         magnitude_threshold=magnitude_threshold)
        if isinstance(signal_loss, dict):
            from tssep_tpu.config.configurable import from_config
            signal_loss = from_config(signal_loss)
        self.signal_loss = signal_loss
        #: Component weights (padertorch ``loss_weights`` equivalent; the
        #: Trainer maps {'vad': w, 'signal': w} onto these).
        self.vad_weight = float(vad_weight)
        self.signal_weight = float(signal_weight)

    def targets(self, lower=False, upper=False):
        return (super().targets(lower=lower, upper=upper)
                + self.signal_loss.targets(lower=lower, upper=upper))

    def device_targets(self):
        return ({'Vad'} if self.target in ('vad', 'Vad')
                else super().device_targets()) \
            | self.signal_loss.device_targets()

    def from_ex_out(self, ex, out, model, summary=None):
        signal_loss = self.signal_loss.from_ex_out(ex, out, model, summary)
        target = ex[self.target]
        estimate = jnp.squeeze(out.vad_logit[..., None], axis=-3)
        return (self.vad_weight * self(estimate, target)
                + self.signal_weight * signal_loss)
