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
    operates on (D, T, F) layout.

    ``backend='numpy'`` runs the host float64 path; ``'jax'`` runs
    :func:`wpe_jax` on the accelerator (the reference's torch ``wpe_v8``
    branch equivalent, ``enhancer.py:316-347``) — same iteration, f32."""

    def __init__(self, taps=10, delay=2, iterations=3, psd_context=0,
                 statistics_mode='full', backend='numpy'):
        self.taps = taps
        self.delay = delay
        self.iterations = iterations
        self.psd_context = psd_context
        self.statistics_mode = statistics_mode
        self.backend = backend

    def __call__(self, observation, inplace=False):
        obs = np.asarray(observation)
        y = np.transpose(obs, (2, 0, 1))  # d t f -> f d t
        if self.backend == 'jax':
            if self.psd_context or self.statistics_mode != 'full':
                raise ValueError(
                    'backend=jax supports psd_context=0, '
                    'statistics_mode=full')
            z = wpe_jax(y, taps=self.taps, delay=self.delay,
                        iterations=self.iterations)
        else:
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


# ---------------------------------------------------------------------------
# On-device WPE (JAX)
# ---------------------------------------------------------------------------

def _wpe_jax_impl(yr, yi, taps, delay, iterations, eps):
    import jax.numpy as jnp

    f, d, t = yr.shape
    k = d * taps

    def tap_stack(a):
        parts = []
        for j in range(taps):
            shift = delay + j
            shifted = jnp.pad(a, ((0, 0), (0, 0), (shift, 0)))[:, :, :t] \
                if shift < t else jnp.zeros_like(a)
            parts.append(shifted)
        return jnp.concatenate(parts, axis=1)          # (F, D*taps, T)

    ytr, yti = tap_stack(yr), tap_stack(yi)
    xr, xi = yr, yi
    eye = jnp.eye(k, dtype=yr.dtype)
    for _ in range(iterations):                         # small static count
        power = jnp.mean(xr ** 2 + xi ** 2, axis=1)     # (F, T)
        w = 1.0 / jnp.maximum(power, eps)               # (F, T)
        wr, wi = ytr * w[:, None, :], yti * w[:, None, :]
        # R = Yt W Yt^H (complex, via real parts)
        rr = jnp.einsum('fat,fbt->fab', wr, ytr) \
            + jnp.einsum('fat,fbt->fab', wi, yti)
        ri = jnp.einsum('fat,fbt->fab', wi, ytr) \
            - jnp.einsum('fat,fbt->fab', wr, yti)
        # P = Yt W Y^H
        pr = jnp.einsum('fat,fbt->fab', wr, yr) \
            + jnp.einsum('fat,fbt->fab', wi, yi)
        pi = jnp.einsum('fat,fbt->fab', wi, yr) \
            - jnp.einsum('fat,fbt->fab', wr, yi)
        # Regularize like the host path
        tr = jnp.trace(rr, axis1=-2, axis2=-1)[:, None, None]
        rr = rr + (eps * tr / k + eps) * eye
        # Complex solve as the real 2x2 block system
        m = jnp.concatenate([
            jnp.concatenate([rr, -ri], axis=-1),
            jnp.concatenate([ri, rr], axis=-1)], axis=-2)   # (F, 2K, 2K)
        rhs = jnp.concatenate([pr, pi], axis=-2)            # (F, 2K, D)
        g = jnp.linalg.solve(m, rhs)
        gr, gi = g[:, :k, :], g[:, k:, :]
        # x = y - G^H Yt  (conj transpose: x_b = y_b - sum_a conj(g_ab) yt_a)
        xr = yr - (jnp.einsum('fab,fat->fbt', gr, ytr)
                   + jnp.einsum('fab,fat->fbt', gi, yti))
        xi = yi - (jnp.einsum('fab,fat->fbt', gr, yti)
                   - jnp.einsum('fab,fat->fbt', gi, ytr))
    return xr, xi


_wpe_jax_jit = None


def wpe_jax(y, taps=10, delay=2, iterations=3, eps=1e-10):
    """On-device WPE (XLA: einsums + batched real-block solves).

    Same iteration as :func:`wpe` (``statistics_mode='full'``) but jit-able
    and TPU-safe: complex arithmetic is expanded to real/imaginary pairs
    (this backend has no complex D2H, and real-block LU runs natively).

    y: (F, D, T) complex array (host) or ``(real, imag)`` tuple of device
    arrays.  Returns the same form it was given.
    """
    import jax
    import jax.numpy as jnp

    global _wpe_jax_jit
    if _wpe_jax_jit is None:
        # module-level jit wrapper: the dispatch cache must outlive the
        # call (a per-call jax.jit would re-trace/compile every recording)
        _wpe_jax_jit = jax.jit(_wpe_jax_impl, static_argnums=(2, 3, 4, 5))
    fn = _wpe_jax_jit
    if isinstance(y, tuple):
        yr, yi = y
        return fn(yr, yi, taps, delay, iterations, eps)
    y = np.asarray(y)
    xr, xi = fn(jnp.asarray(y.real, jnp.float32),
                jnp.asarray(y.imag, jnp.float32),
                taps, delay, iterations, eps)
    return np.asarray(xr) + 1j * np.asarray(xi)
