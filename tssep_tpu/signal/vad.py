"""Sample-domain <-> STFT-frame-domain activity conversion.

Equivalent of the reference's ``tssep/util/utils.py:11-129`` (``stft_vad`` /
``istft_vad``): activity is converted interval-wise (not per-sample), so the
mapping is exact for run-length encoded VAD of arbitrarily long recordings.
"""

from __future__ import annotations

import numpy as np

from tssep_tpu.signal.intervals import ArrayInterval
from tssep_tpu.signal.stft import (
    frame_index_to_sample_index,
    sample_index_to_frame_index,
    samples_to_frames,
)

__all__ = ['stft_vad', 'istft_vad']


def _single_stft_vad(a, window_length, shift, fading) -> ArrayInterval:
    if isinstance(a, ArrayInterval):
        ai_in = a
        num_samples = len(a)
    else:
        ai_in = ArrayInterval(np.asarray(a, dtype=bool))
        num_samples = len(a)
    frames = samples_to_frames(
        num_samples, size=window_length, shift=shift, pad=True, fading=fading,
    )
    out = ArrayInterval([], shape=frames)
    for s, e in ai_in.normalized_intervals:
        fs = int(sample_index_to_frame_index(
            s, window_length=window_length, shift=shift, fading=fading))
        fe = int(sample_index_to_frame_index(
            e, window_length=window_length, shift=shift, fading=fading))
        out[fs:min(fe, frames)] = True
    return out


def stft_vad(vad, window_length, shift, fading):
    """Sample activity -> frame activity (recursive over leading axes/lists)."""
    if isinstance(vad, ArrayInterval):
        return _single_stft_vad(vad, window_length, shift, fading)
    if isinstance(vad, np.ndarray):
        if vad.ndim == 1:
            return _single_stft_vad(vad, window_length, shift, fading)
        data = np.empty(vad.shape[:-1], dtype=object)
        for idx in np.ndindex(vad.shape[:-1]):
            data[idx] = _single_stft_vad(vad[idx], window_length, shift, fading)
        return np.array(
            [np.asarray(ai, dtype=bool) for ai in data.reshape(-1)]
        ).reshape(vad.shape[:-1] + (-1,))
    if isinstance(vad, (tuple, list)):
        return [stft_vad(v, window_length, shift, fading) for v in vad]
    # torch / jax tensors: convert through numpy
    if hasattr(vad, 'numpy'):
        return stft_vad(np.asarray(vad.detach().cpu() if hasattr(vad, 'detach') else vad),
                        window_length, shift, fading)
    raise TypeError(type(vad))


def _single_istft_vad(a, window_length, shift, fading) -> ArrayInterval:
    ai_in = a if isinstance(a, ArrayInterval) else ArrayInterval(np.asarray(a, dtype=bool))
    out = ArrayInterval([])
    for fs, fe in ai_in.normalized_intervals:
        s = int(frame_index_to_sample_index(
            fs, window_length=window_length, shift=shift, fading=fading,
            mode='first'))
        e = int(frame_index_to_sample_index(
            fe, window_length=window_length, shift=shift, fading=fading,
            mode='last'))
        out[s:e] = True
    return out


def istft_vad(vad, window_length, shift, fading):
    """Frame activity -> sample activity (returns ArrayIntervals)."""
    if isinstance(vad, ArrayInterval):
        return _single_istft_vad(vad, window_length, shift, fading)
    if isinstance(vad, np.ndarray):
        if vad.ndim == 1:
            return _single_istft_vad(vad, window_length, shift, fading)
        data = np.empty(vad.shape[:-1], dtype=object)
        for idx in np.ndindex(vad.shape[:-1]):
            data[idx] = _single_istft_vad(vad[idx], window_length, shift, fading)
        return data.tolist()
    if isinstance(vad, (tuple, list)):
        return [istft_vad(v, window_length, shift, fading) for v in vad]
    raise TypeError(type(vad))
