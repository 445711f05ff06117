"""STFT / ISTFT with paderbox-compatible frame semantics, dual numpy/JAX.

The reference delegates all STFT work to ``paderbox.transform.STFT`` (used from
``tssep/train/feature_extractor.py:8`` and configured in
``tssep/exp/init_cfg_common.yaml:16-21``).  The semantics re-implemented here:

- analysis window of length ``window_length`` (default ``size``), periodic
  (``sym=False``); supported: hann, blackman, boxcar (and any scipy window
  name via ``scipy.signal.get_window``),
- ``fading=True``: the signal is zero-padded by ``window_length - shift``
  samples on *both* sides before framing, so a sample at position 0 fades in,
- ``pad=True``: the last partial frame is zero-padded to a full frame,
- frames of ``window_length`` samples every ``shift`` samples, multiplied by
  the window and transformed by an rFFT of length ``size``,
- synthesis uses the *biorthogonal* window
  ``w_s[n] = w[n] / sum_k w[n - k*shift]^2`` (exact reconstruction for any
  window/shift), overlap-add, then removal of the fading padding and optional
  trimming to ``num_samples``.

Frame-count formula (pinned by the reference golden
``tssep/train/feature_extractor.py:199-200``: 10_000 samples with
size=1024/shift=256/fading=True -> 43 frames):
``frames = max(1, ceil((T_padded - window_length) / shift) + 1)``.

The JAX forward path avoids gathers when ``window_length % shift == 0`` by
using the strided-reshape decomposition (``window_length // shift``
interleaved contiguous reshapes), which XLA fuses well on TPU.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'STFT',
    'stft_windows',
    'samples_to_frames',
    'frames_to_samples',
    'sample_index_to_frame_index',
    'frame_index_to_sample_index',
]


# ---------------------------------------------------------------------------
# Windows (host-side constants; periodic by default, matching paderbox)
# ---------------------------------------------------------------------------

def stft_windows(name: str, length: int, sym: bool = False) -> np.ndarray:
    n = np.arange(length)
    denom = length if not sym else max(length - 1, 1)
    if name in ('hann', 'hanning'):
        w = 0.5 - 0.5 * np.cos(2 * np.pi * n / denom)
    elif name == 'blackman':
        w = (0.42 - 0.5 * np.cos(2 * np.pi * n / denom)
             + 0.08 * np.cos(4 * np.pi * n / denom))
    elif name in ('boxcar', 'rect', 'rectangular', 'ones'):
        w = np.ones(length)
    else:
        import scipy.signal
        w = scipy.signal.get_window(name, length, fftbins=not sym)
    return w.astype(np.float64)


def _biorthogonal_window(window: np.ndarray, shift: int) -> np.ndarray:
    """Synthesis window for exact reconstruction: w / (shift-periodic sum w^2)."""
    length = len(window)
    denom = np.zeros(shift)
    for i in range(shift):
        denom[i] = np.sum(window[i::shift] ** 2)
    denom = np.where(denom == 0, 1.0, denom)
    idx = np.arange(length) % shift
    return window / denom[idx]


# ---------------------------------------------------------------------------
# Frame index math
# ---------------------------------------------------------------------------

def _fading_pad_width(window_length, shift, fading):
    if fading in (None, False):
        return 0
    if fading in (True, 'full'):
        return window_length - shift
    if fading == 'half':
        return (window_length - shift) // 2
    raise ValueError(f'Unknown fading: {fading!r}')


def samples_to_frames(samples, *, size, shift, pad=True, fading=True):
    """Number of STFT frames for a ``samples``-long signal.

    ``size`` is the window length here (matching the reference call site
    ``tssep/util/utils.py:36-42`` which passes ``window_length``).
    """
    samples = samples + 2 * _fading_pad_width(size, shift, fading)
    if samples < size:
        return 1 if pad else 0
    if pad:
        return (samples - size + shift - 1) // shift + 1
    return (samples - size) // shift + 1


def frames_to_samples(frames, *, size, shift, fading=True):
    """Samples covered by ``frames`` frames, fading padding removed."""
    return frames * shift + size - shift - 2 * _fading_pad_width(size, shift, fading)


def sample_index_to_frame_index(sample_index, *, window_length, shift, fading=True):
    """Best (center-most covering) frame index for a sample index.

    A sample ``s`` (after fading offset) is covered by frames
    ``k in [ceil((s - window_length + shift)/shift), s // shift]``; this
    returns the middle of that range, clipped at 0 — the frame in which the
    sample sits most centrally.  Used for sample→frame activity mapping
    (reference ``tssep/util/utils.py:53-64``).
    """
    sample_index = np.asarray(sample_index)
    s = sample_index + _fading_pad_width(window_length, shift, fading)
    frame = s // shift - (window_length // shift - 1) // 2
    return np.maximum(0, frame)


def frame_index_to_sample_index(
    frame_index, *, window_length, shift, fading=True, mode='center',
    num_samples=None,
):
    """Map a frame index back to a sample index.

    ``mode='first'``: first sample covered by this frame.
    ``mode='last'``: one-past-the-last sample covered by frame
    ``frame_index - 1`` (i.e. suitable as an *exclusive* end for an exclusive
    frame range, as used by the reference's ``istft_vad``,
    ``tssep/util/utils.py:106-119``).
    ``mode='center'``: center sample of the frame.
    """
    frame_index = np.asarray(frame_index)
    pad = _fading_pad_width(window_length, shift, fading)
    if mode == 'first':
        s = frame_index * shift - pad
    elif mode == 'last':
        s = (frame_index - 1) * shift + window_length - pad
    elif mode == 'center':
        s = frame_index * shift + window_length // 2 - pad
    else:
        raise ValueError(mode)
    s = np.maximum(0, s)
    if num_samples is not None:
        s = np.minimum(s, num_samples)
    return s


# ---------------------------------------------------------------------------
# STFT object
# ---------------------------------------------------------------------------

def _is_jax(x):
    return isinstance(x, jax.Array) or isinstance(
        x, jax.core.Tracer if hasattr(jax.core, 'Tracer') else ()
    )


@dataclasses.dataclass(frozen=True)
class STFT:
    """Short-time Fourier transform (analysis + synthesis).

    Works on numpy arrays (host/eval path, float64) and JAX arrays
    (device/training path) with identical semantics.
    """

    size: int = 1024
    shift: int = 256
    window_length: int | None = None
    pad: bool = True
    fading: bool | str = True
    window: str = 'blackman'
    symmetric_window: bool = False

    def __post_init__(self):
        if self.window_length is None:
            object.__setattr__(self, 'window_length', self.size)
        assert self.window_length <= self.size, (self.window_length, self.size)

    # -- derived constants -------------------------------------------------
    @property
    def frequencies(self) -> int:
        return self.size // 2 + 1

    @property
    def fading_pad(self) -> int:
        return _fading_pad_width(self.window_length, self.shift, self.fading)

    @functools.cached_property
    def analysis_window(self) -> np.ndarray:
        return stft_windows(self.window, self.window_length, self.symmetric_window)

    @functools.cached_property
    def synthesis_window(self) -> np.ndarray:
        return _biorthogonal_window(self.analysis_window, self.shift)

    # -- frame math --------------------------------------------------------
    def num_frames(self, num_samples: int) -> int:
        return samples_to_frames(
            num_samples, size=self.window_length, shift=self.shift,
            pad=self.pad, fading=self.fading,
        )

    def sample_index_to_frame_index(self, sample_index):
        return sample_index_to_frame_index(
            sample_index, window_length=self.window_length, shift=self.shift,
            fading=self.fading,
        )

    # -- analysis ----------------------------------------------------------
    def __call__(self, signal):
        return self.stft(signal)

    def stft(self, signal):
        if _is_jax(signal):
            return self._stft_jax(signal)
        return self._stft_np(np.asarray(signal))

    def _frame_layout(self, num_samples):
        pad = self.fading_pad
        total = num_samples + 2 * pad
        frames = self.num_frames(num_samples)
        padded_len = max(total, (frames - 1) * self.shift + self.window_length)
        return pad, frames, padded_len, padded_len - total

    def _stft_np(self, signal):
        pad, frames, padded_len, end_pad = self._frame_layout(signal.shape[-1])
        width = [(0, 0)] * (signal.ndim - 1) + [(pad, pad + end_pad)]
        x = np.pad(signal, width, mode='constant')
        stride = x.strides[-1]
        shape = x.shape[:-1] + (frames, self.window_length)
        strides = x.strides[:-1] + (self.shift * stride, stride)
        segs = np.lib.stride_tricks.as_strided(x, shape=shape, strides=strides)
        return np.fft.rfft(segs * self.analysis_window, n=self.size, axis=-1)

    def _stft_jax(self, signal):
        # NOTE: XLA's FFT op is unavailable on some TPU runtimes, and for STFT
        # sizes (<= a few k) a real-DFT matmul maps straight onto the MXU, so
        # the device path contracts windowed frames against cached DFT bases.
        pad, frames, padded_len, end_pad = self._frame_layout(signal.shape[-1])
        width = [(0, 0)] * (signal.ndim - 1) + [(pad, pad + end_pad)]
        x = jnp.pad(signal, width)
        segs = _frame_jax(x, frames, self.window_length, self.shift)
        w = jnp.asarray(self.analysis_window, dtype=segs.dtype)
        segs = segs * w
        if self.size > self.window_length:
            segs = jnp.pad(
                segs, [(0, 0)] * (segs.ndim - 1) + [(0, self.size - self.window_length)]
            )
        cos_m, sin_m = _rdft_matrices(self.size)
        dtype = segs.dtype
        re = _mm(segs, jnp.asarray(cos_m, dtype))
        im = _mm(segs, jnp.asarray(sin_m, dtype))
        return jax.lax.complex(re, im)

    # -- synthesis ---------------------------------------------------------
    def istft(self, stft_signal, num_samples: int | None = None):
        if isinstance(stft_signal, tuple):
            # (re, im) pair: the training Masking path multiplies the
            # observation's re/im by the (real) mask directly — the
            # complex product tensor and its dtype upcasts never
            # materialize (2x ~1.3 GB converts + a 2.7 GB c64
            # intermediate at flagship dims, tools/analyze_hlo.py).
            return self._istft_jax(stft_signal, num_samples)
        if _is_jax(stft_signal):
            return self._istft_jax(stft_signal, num_samples)
        return self._istft_np(np.asarray(stft_signal), num_samples)

    def _trim(self, time_signal, num_samples):
        pad = self.fading_pad
        start = pad
        if num_samples is not None:
            return time_signal[..., start:start + num_samples]
        end = time_signal.shape[-1] - pad
        return time_signal[..., start:end]

    def _istft_np(self, S, num_samples):
        frames = S.shape[-2]
        segs = np.fft.irfft(S, n=self.size, axis=-1)[..., :self.window_length]
        segs = segs * self.synthesis_window
        total = (frames - 1) * self.shift + self.window_length
        out = np.zeros(S.shape[:-2] + (total,), dtype=segs.dtype)
        for f in range(frames):
            out[..., f * self.shift:f * self.shift + self.window_length] += segs[..., f, :]
        return self._trim(out, num_samples)

    def _istft_jax(self, S, num_samples):
        if isinstance(S, tuple):
            re, im = S
            S = re  # shape/dtype carrier below
        else:
            re, im = jnp.real(S), jnp.imag(S)
        frames = S.shape[-2]
        icos_m, isin_m = _irdft_matrices(self.size, self.window_length)
        if _HEAD_BF16:
            # Training-loss path (TSSEP_HEAD_BF16): the per-speaker
            # (B, S, T, window) synthesis segments are the largest
            # tensors in the step — bf16 halves their HBM traffic; the
            # loss upcasts its reductions.  Eval synthesis uses the
            # numpy path and is unaffected.
            re, im = re.astype(jnp.bfloat16), im.astype(jnp.bfloat16)
        dtype = re.dtype
        w = self.synthesis_window
        total = (frames - 1) * self.shift + self.window_length
        if (self.window_length % self.shift == 0
                and _os.environ.get('TSSEP_ISTFT_PIECEWISE', '1') != '0'):
            # Piece-wise synthesis: never materialize the full
            # (..., frames, window_length) segment tensor — at flagship
            # train dims that tensor is (B, S, T, 1024) f32 = 2.5 GB and
            # its overlap-add reshuffle another 2.5 GB, the largest
            # transients of the whole step (chip OOM evidence, round 4).
            # Window folded into the DFT bases: (re @ icos) * w ==
            # re @ (icos * w); each shift-wide column block is one MXU
            # matmul and one shifted accumulate.
            k = self.window_length // self.shift
            nblocks = frames + k - 1
            out = jnp.zeros(S.shape[:-2] + (nblocks, self.shift),
                            dtype=dtype)
            for i in range(k):
                sl = slice(i * self.shift, (i + 1) * self.shift)
                icos_i = jnp.asarray(icos_m[:, sl] * w[sl], dtype)
                isin_i = jnp.asarray(isin_m[:, sl] * w[sl], dtype)
                piece = _mm(re, icos_i) + _mm(im, isin_i)
                out = out.at[..., i:i + frames, :].add(piece)
            out = out.reshape(S.shape[:-2] + (nblocks * self.shift,))
            return self._trim(out[..., :total], num_samples)
        segs = (_mm(re, jnp.asarray(icos_m, dtype))
                + _mm(im, jnp.asarray(isin_m, dtype)))
        segs = segs * jnp.asarray(w, dtype=segs.dtype)
        out = _overlap_add_jax(segs, self.shift, total)
        return self._trim(out, num_samples)


import os as _os

#: MXU precision for the DFT contractions.  'highest' = 6-pass f32 emulation
#: (bit-accurate vs numpy to ~1e-7, the parity default); 'high' = 3 passes;
#: 'default' = native bf16 (fastest; fine for training — the eval path is
#: numpy/f64 regardless).
#: See tssep_tpu.nn.estimator.HEAD_DTYPE — bf16 head/loss path (opt-in).
_HEAD_BF16 = _os.environ.get('TSSEP_HEAD_BF16', '0') != '0'

_DFT_PRECISION = {
    'highest': jax.lax.Precision.HIGHEST,
    'high': jax.lax.Precision.HIGH,
    'default': jax.lax.Precision.DEFAULT,
}[_os.environ.get('TSSEP_DFT_PRECISION', 'highest')]


def _mm(a, b):
    """DFT-basis matmul with configurable MXU precision (f32 accumulation)."""
    return jnp.matmul(a, b, precision=_DFT_PRECISION)


@functools.lru_cache(maxsize=None)
def _rdft_matrices(size):
    """Real-DFT bases: frame @ cos -> Re, frame @ sin -> Im (rfft convention)."""
    n = np.arange(size)[:, None]
    k = np.arange(size // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / size
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _irdft_matrices(size, out_length):
    """Inverse real-DFT bases: Re @ icos + Im @ isin -> time frame."""
    k = np.arange(size // 2 + 1)[:, None]
    m = np.arange(out_length)[None, :]
    ang = 2.0 * np.pi * k * m / size
    scale = np.full((size // 2 + 1, 1), 2.0 / size)
    scale[0] = 1.0 / size
    if size % 2 == 0:
        scale[-1] = 1.0 / size
    icos = (np.cos(ang) * scale).astype(np.float32)
    isin = (-np.sin(ang) * scale).astype(np.float32)
    return icos, isin


def _frame_jax(x, frames, window_length, shift):
    """Extract overlapping frames from the last axis (already padded).

    Uses the strided-reshape decomposition when ``window_length % shift == 0``
    (pure reshapes/slices, no gather); falls back to a gather otherwise.
    """
    if window_length % shift == 0:
        k = window_length // shift
        # x[..., :needed] viewed as (frames + k - 1, shift) blocks; frame f =
        # blocks[f:f+k] flattened.
        nblocks = frames + k - 1
        needed = nblocks * shift
        if x.shape[-1] < needed:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, needed - x.shape[-1])])
        blocks = x[..., :needed].reshape(x.shape[:-1] + (nblocks, shift))
        parts = [blocks[..., i:i + frames, :] for i in range(k)]
        return jnp.concatenate(parts, axis=-1)
    idx = (np.arange(frames)[:, None] * shift
           + np.arange(window_length)[None, :])
    return x[..., idx]


def _overlap_add_jax(segs, shift, total):
    """Overlap-add frames (..., frames, window_length) -> (..., total)."""
    frames, wl = segs.shape[-2], segs.shape[-1]
    if wl % shift == 0:
        k = wl // shift
        nblocks = frames + k - 1
        out = jnp.zeros(segs.shape[:-2] + (nblocks, shift), dtype=segs.dtype)
        pieces = segs.reshape(segs.shape[:-1] + (k, shift))
        for i in range(k):
            out = out.at[..., i:i + frames, :].add(pieces[..., i, :])
        return out.reshape(segs.shape[:-2] + (nblocks * shift,))[..., :total]
    idx = (np.arange(frames)[:, None] * shift + np.arange(wl)[None, :])
    out = jnp.zeros(segs.shape[:-2] + (total,), dtype=segs.dtype)
    return out.at[..., idx].add(segs)
