"""Weighted prediction error (WPE) dereverberation.

Native equivalent of the nara_wpe ``wpe_v8`` capability the reference wraps
(``tssep/train/enhancer.py:292-367``; defaults taps=10, delay=2,
iterations=3).  Iterative MIMO linear prediction per frequency:

    for it in iterations:
        power[f, t]   = mean_d |X[f, d, t]|^2
        Y_tilde       = stacked taps of Y delayed by delay..delay+taps-1
        R             = Y_tilde diag(1/power) Y_tilde^H
        P             = Y_tilde diag(1/power) Y^H
        G             = solve(R, P)
        X             = Y - G^H Y_tilde

``statistics_mode='full'`` uses zero-padded history (every output frame has
a prediction); ``'valid'`` computes the correlations only where the full tap
history exists.
"""

from __future__ import annotations

import numpy as np

__all__ = ['wpe', 'WPE', 'ChannelWiseWPE', 'build_tap_stack']


def build_tap_stack(y, taps, delay):
    """y: (F, D, T) -> (F, D*taps, T): channel-major stack of delayed frames
    (tap k = delay + k)."""
    f, d, t = y.shape
    out = np.zeros((f, d * taps, t), dtype=y.dtype)
    for k in range(taps):
        shift = delay + k
        if shift < t:
            out[:, k * d:(k + 1) * d, shift:] = y[:, :, :t - shift]
    return out


def wpe(y, taps=10, delay=2, iterations=3, psd_context=0,
        statistics_mode='full', eps=1e-10):
    """Dereverberate y (F, D, T) complex -> same shape."""
    y = np.asarray(y)
    f, d, t = y.shape
    y_tilde = build_tap_stack(y, taps, delay)
    x = y.copy()
    for _ in range(iterations):
        power = np.mean(np.abs(x) ** 2, axis=1)  # (F, T)
        if psd_context:
            kernel = np.ones(2 * psd_context + 1)
            power = np.stack([
                np.convolve(p, kernel, mode='same')
                / np.convolve(np.ones_like(p), kernel, mode='same')
                for p in power])
        inv_power = 1.0 / np.maximum(power, eps)

        if statistics_mode == 'valid':
            s = slice(delay + taps - 1, None)
        else:
            s = slice(None)
        yt = y_tilde[..., s]
        ys = y[..., s]
        w = inv_power[:, None, s]
        r = np.einsum('fat,fbt->fab', yt * w, yt.conj())
        p = np.einsum('fat,fbt->fab', yt * w, ys.conj())
        # regularize
        r += eps * np.trace(r, axis1=-2, axis2=-1).real[:, None, None] \
            * np.eye(d * taps) / (d * taps) + eps * np.eye(d * taps)
        g = np.linalg.solve(r, p)  # (F, D*taps, D)
        x = y - np.einsum('fab,fat->fbt', g.conj(), y_tilde)
    return x


class WPE:
    """Config-compatible wrapper (reference ``enhancer.py:292-348``):
    operates on (D, T, F) layout."""

    def __init__(self, taps=10, delay=2, iterations=3, psd_context=0,
                 statistics_mode='full'):
        self.taps = taps
        self.delay = delay
        self.iterations = iterations
        self.psd_context = psd_context
        self.statistics_mode = statistics_mode

    def __call__(self, observation, inplace=False):
        obs = np.asarray(observation)
        y = np.transpose(obs, (2, 0, 1))  # d t f -> f d t
        z = wpe(y, taps=self.taps, delay=self.delay,
                iterations=self.iterations, psd_context=self.psd_context,
                statistics_mode=self.statistics_mode)
        return np.transpose(z, (1, 2, 0))


class ChannelWiseWPE(WPE):
    """Apply WPE per channel (channels folded into frequency)."""

    def __call__(self, observation, inplace=False):
        obs = np.asarray(observation)
        d, t, f = obs.shape
        folded = obs.transpose(1, 0, 2).reshape(1, t, d * f)
        out = super().__call__(folded)
        return out.reshape(t, d, f).transpose(1, 0, 2)
