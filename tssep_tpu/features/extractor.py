"""STFT-based feature extractors.

Re-implements the feature family the reference assembles from
``padertorch.contrib.cb.feature_extractor`` plus its own subclasses
(``tssep/train/feature_extractor.py``, ``feature_extractor_torchaudio.py``):

- ``STFTFeatures`` (base; complex STFT as the "feature")
- ``AbsSTFT`` / ``Log1pAbsSTFT`` / ``MVNLog1pAbsSTFT``
- ``Log1pMaxNormAbsSTFT``     (the toy/TS-VAD magnitude feature)
- ``NoFeatureSTFT``
- IPD variants (``Log1pAbsIPDSTFT``, ``Log1pMaxNormAbsIPDSTFT``)
- ``MFCC`` (torchaudio-compatible numerics, natively implemented)
- ``ConcatenatedSTFTFeatures`` (fe1 ⊕ fe2 on a shared STFT)

Every extractor operates on numpy *and* JAX arrays with identical semantics;
the JAX path is jit-safe (static shapes, no host callbacks).
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np

from tssep_tpu.config.configurable import Configurable
from tssep_tpu.signal.mel import amplitude_to_db, create_dct, mel_filterbank
from tssep_tpu.signal.stft import STFT

__all__ = [
    'STFTFeatures', 'AbsSTFT', 'Log1pAbsSTFT', 'MVNLog1pAbsSTFT',
    'Log1pMaxNormAbsSTFT', 'NoFeatureSTFT', 'Log1pAbsIPDSTFT',
    'Log1pMaxNormAbsIPDSTFT', 'MFCC', 'TorchMFCC', 'ConcatenatedSTFTFeatures',
    'ConcaternatedSTFTFeatures', 'interchannel_phase_differences',
]


def _xp(x):
    return jnp if isinstance(x, jnp.ndarray) and not isinstance(x, np.ndarray) else np


class STFTFeatures(Configurable):
    """Base feature extractor: an STFT plus a ``stft_to_feature`` transform."""

    def __init__(self, size=1024, shift=256, window_length=None, pad=True,
                 fading=True, output_size=None, window='blackman'):
        self.size = size
        self.shift = shift
        self.window_length = window_length if window_length is not None else size
        self.pad = pad
        self.fading = fading
        self.window = window
        self._stft = STFT(
            size=size, shift=shift, window_length=self.window_length,
            pad=pad, fading=fading, window=window,
        )
        self.output_size = self._get_output_size(output_size)

    # -- config ------------------------------------------------------------
    @classmethod
    def finalize_dogmatic_config(cls, config):
        if config.get('window_length') is None:
            config['window_length'] = config.get('size', 1024)

    # -- geometry ----------------------------------------------------------
    @property
    def frequencies(self):
        return self.size // 2 + 1

    def _get_output_size(self, output_size):
        if output_size is None:
            return self.frequencies
        assert output_size == self.frequencies, (output_size, self.frequencies)
        return output_size

    def sample_index_to_frame_index(self, sample_index):
        return self._stft.sample_index_to_frame_index(sample_index)

    def num_frames(self, num_samples):
        return self._stft.num_frames(num_samples)

    # -- transforms ---------------------------------------------------------
    def stft(self, signal):
        return self._stft.stft(signal)

    def istft(self, stft_signal, num_samples=None):
        return self._stft.istft(stft_signal, num_samples=num_samples)

    def stft_to_feature(self, stft_signals):
        return stft_signals

    # -- streaming ----------------------------------------------------------
    #: True when ``stft_to_feature`` is frame-local (no cross-frame
    #: statistics): block-wise streaming is then bit-identical to offline.
    frame_local = False

    def init_streaming_state(self):
        """Initial state for ``streaming_feature`` (None = stateless)."""
        return None

    def streaming_feature(self, block, state):
        """Features for a block of STFT frames with *causal* statistics.

        Offline utterance-level statistics (max/mean normalizers) are
        replaced by running statistics over all frames seen so far;
        frame-local extractors are exact.  Returns ``(features, state)``.
        Extractors whose statistics cannot be maintained causally raise —
        streaming must not silently change feature semantics.
        """
        if self.frame_local:
            return self.stft_to_feature(block), state
        raise NotImplementedError(
            f'{type(self).__name__} has cross-frame feature statistics '
            f'with no causal streaming equivalent implemented; streaming '
            f'inference would silently change semantics. Use a frame-local '
            f'or running-stats extractor, or implement streaming_feature.')

    def __call__(self, signal):
        return self.stft_to_feature(self.stft(signal))

    def __repr__(self):
        return (f'{self.__class__.__name__}(size={self.size}, '
                f'shift={self.shift}, window_length={self.window_length}, '
                f'pad={self.pad}, fading={self.fading}, '
                f'output_size={self.output_size}, window={self.window!r})')


class AbsSTFT(STFTFeatures):
    frame_local = True

    def stft_to_feature(self, stft_signals):
        return abs(stft_signals)


class Log1pAbsSTFT(STFTFeatures):
    frame_local = True

    def stft_to_feature(self, stft_signals):
        xp = _xp(stft_signals)
        return xp.log1p(abs(stft_signals))


class MVNLog1pAbsSTFT(Log1pAbsSTFT):
    """Utterance mean (and optionally variance) normalized log1p magnitude."""

    def __init__(self, size=1024, shift=256, window_length=None, pad=True,
                 fading=True, output_size=None, window='blackman',
                 norm_means=True, norm_vars=False, eps=1.0e-20):
        super().__init__(size=size, shift=shift, window_length=window_length,
                         pad=pad, fading=fading, output_size=output_size,
                         window=window)
        self.norm_means = norm_means
        self.norm_vars = norm_vars
        self.eps = eps

    def stft_to_feature(self, stft_signals):
        xp = _xp(stft_signals)
        feature = super().stft_to_feature(stft_signals)
        if not self.norm_means:
            raise NotImplementedError('norm_means=False')
        mean = xp.mean(feature, axis=-2, keepdims=True)
        feature = feature - mean
        if self.norm_vars:
            raise NotImplementedError('norm_vars=True')
        return feature

    frame_local = False

    def init_streaming_state(self):
        return {'count': 0, 'sum': None}

    def streaming_feature(self, block, state):
        """Causal MVN: subtract the running mean over all frames so far
        (the causal analog of the offline utterance mean)."""
        feature = np.log1p(np.abs(block))
        s = feature.sum(axis=-2)
        state = {'count': state['count'] + feature.shape[-2],
                 'sum': s if state['sum'] is None else state['sum'] + s}
        mean = state['sum'] / max(state['count'], 1)
        return feature - mean[..., None, :], state


class Log1pMaxNormAbsSTFT(STFTFeatures):
    """``log1p(|X| * (e-1) / max|X|)`` in [0, 1].

    Golden values pinned by reference ``feature_extractor.py:194-204``:
    seeded 10k-sample uniform noise -> shape (43, 513),
    mean 0.03461, min 1.0e-6, max 1.0, std 0.05165.
    """

    def __init__(self, size=1024, shift=256, window_length=None, pad=True,
                 fading=True, output_size=None, window='blackman',
                 statistics_axis='tf'):
        super().__init__(size=size, shift=shift, window_length=window_length,
                         pad=pad, fading=fading, output_size=output_size,
                         window=window)
        self.statistics_axis = statistics_axis

    def stft_to_feature(self, stft_signals):
        xp = _xp(stft_signals)
        s = abs(stft_signals)
        axis = {'tf': (-2, -1), 't': (-2,), 'f': (-1,)}[self.statistics_axis]
        norm = xp.amax(s, keepdims=True, axis=axis)
        return xp.log1p(s * ((np.e - 1) / norm))

    # statistics_axis 'f' (per-frame max over freq) is frame-local; 'tf'
    # and 't' keep a running max over all frames seen so far.
    def init_streaming_state(self):
        return {'max': None}

    def streaming_feature(self, block, state):
        s = np.abs(block)
        if self.statistics_axis == 'f':
            return self.stft_to_feature(block), state
        if self.statistics_axis == 'tf':
            cur = float(s.max()) if s.size else 0.0
            prev = state['max'] if state['max'] is not None else 1e-30
            norm = max(prev, cur, 1e-30)
        elif self.statistics_axis == 't':
            cur = (s.max(axis=-2) if s.shape[-2]
                   else np.zeros(s.shape[-1]))
            prev = (state['max'] if state['max'] is not None
                    else np.full(s.shape[-1], 1e-30))
            norm = np.maximum(np.maximum(prev, cur), 1e-30)
        else:
            raise ValueError(self.statistics_axis)
        state = {'max': norm}
        return np.log1p(s * ((np.e - 1) / norm)), state


class NoFeatureSTFT(STFTFeatures):
    frame_local = True

    def stft_to_feature(self, stft_signals):
        return stft_signals[..., :0]

    def _get_output_size(self, output_size):
        if output_size is None:
            return 0
        assert output_size == 0, output_size
        return output_size


# ---------------------------------------------------------------------------
# IPD features
# ---------------------------------------------------------------------------

#: Host-side RNG for the random channel pairing.  ``None`` (default) uses
#: numpy's global legacy RNG — bit-parity with the reference
#: (``feature_extractor.py:13-80``; its doctest goldens seed the global
#: stream).  Set an explicit Generator via :func:`seed_ipd_rng` to decouple
#: the pairing from the global stream (the framework's explicit-PRNG
#: reproducibility stance).
_IPD_RNG = None


def seed_ipd_rng(seed):
    """Give the channel pairing its own reseedable RNG (pass ``None`` to
    restore reference global-RNG parity)."""
    global _IPD_RNG
    _IPD_RNG = None if seed is None else np.random.default_rng(seed)


def interchannel_phase_differences(signal, second_channel=None,
                                   concatenate=False, rng=None):
    """cos/sin of inter-channel phase differences.

    ``signal``: (..., channels, frames, frequencies).  When
    ``second_channel`` is not given, a random derangement-ish pairing is
    sampled host-side from ``rng``, the module RNG (see
    :func:`seed_ipd_rng`), or — parity default — numpy's global RNG
    (reference ``feature_extractor.py:13-80``).
    """
    xp = _xp(signal)
    if second_channel is None:
        D = signal.shape[-3]
        assert D >= 2, signal.shape
        pairs = list(itertools.permutations(range(D), 2))
        (rng if rng is not None
         else _IPD_RNG if _IPD_RNG is not None
         else np.random).shuffle(pairs)
        second_channel = np.array(sorted(dict(pairs).items()))[:, 1]
    product = signal * signal[..., second_channel, :, :].conj()
    denom = abs(product)
    xp_ = xp
    sincos = product / xp_.where(denom == 0, 1.0, denom)
    if concatenate:
        return xp.concatenate(
            [abs(signal), sincos.real, sincos.imag], axis=-1)
    return sincos.real, sincos.imag


class AbsIPDSTFT(STFTFeatures):
    def _get_output_size(self, output_size):
        if output_size is None:
            return self.frequencies * 3
        assert output_size == self.frequencies * 3, (output_size, self.frequencies)
        return output_size

    def stft_to_feature(self, stft_signals):
        return interchannel_phase_differences(stft_signals, concatenate=True)


class Log1pAbsIPDSTFT(AbsIPDSTFT):
    def stft_to_feature(self, stft_signals):
        xp = _xp(stft_signals)
        cos, sin = interchannel_phase_differences(stft_signals, concatenate=False)
        return xp.concatenate([xp.log1p(abs(stft_signals)), cos, sin], axis=-1)


class Log1pMaxNormAbsIPDSTFT(Log1pMaxNormAbsSTFT):
    def _get_output_size(self, output_size):
        if output_size is None:
            return self.frequencies * 3
        assert output_size == self.frequencies * 3, (output_size, self.frequencies)
        return output_size

    def stft_to_feature(self, stft_signals):
        xp = _xp(stft_signals)
        feat = super().stft_to_feature(stft_signals)
        cos, sin = interchannel_phase_differences(stft_signals, concatenate=False)
        return xp.concatenate([feat, cos, sin], axis=-1)

    def streaming_feature(self, block, state):
        # Do NOT inherit the MaxNorm streaming path: it would silently drop
        # the IPD part, and the random channel pairing is re-sampled per
        # call, so block-wise output would be inconsistent across blocks.
        raise NotImplementedError(
            'IPD extractors sample a random channel pairing per call and '
            'are not supported in streaming inference.')


# ---------------------------------------------------------------------------
# MFCC
# ---------------------------------------------------------------------------

class MFCC(STFTFeatures):
    """MFCC on the shared STFT, numerically matching the reference's
    torchaudio-based ``TorchMFCC`` (``feature_extractor_torchaudio.py:11-106``):
    power spectrogram -> mel filterbank -> AmplitudeToDB('power', 80) (or log)
    -> DCT-II.

    NOTE ``frame_local`` nuance: with ``log_mels=False`` the
    AmplitudeToDB top-db clamp uses the block max; causal streaming keeps
    a running max instead (see ``streaming_feature``).
    """

    def __init__(self, size=400, shift=200, window_length=None, pad=True,
                 fading=True, output_size=None, window='hann',
                 sample_rate=16000, n_mfcc=40, dct_norm='ortho',
                 log_mels=False, f_min=40, f_max=-400, n_mels=40,
                 mel_norm=None, mel_scale='htk'):
        self.n_mfcc = n_mfcc
        super().__init__(size=size, shift=shift, window_length=window_length,
                         pad=pad, fading=fading, output_size=output_size,
                         window=window)
        self.sample_rate = sample_rate
        self.f_min = f_min
        if f_max and f_max < 0:
            f_max = sample_rate + f_max
        self.f_max = f_max
        self.n_mels = n_mels
        self.dct_norm = dct_norm
        self.mel_norm = mel_norm
        self.mel_scale = mel_scale
        self.top_db = 80
        self.log_mels = log_mels
        self.fbank = mel_filterbank(
            n_freqs=size // 2 + 1, f_min=self.f_min, f_max=self.f_max,
            n_mels=n_mels, sample_rate=sample_rate, norm=mel_norm,
            mel_scale=mel_scale,
        ).astype(np.float32)
        self.dct_mat = create_dct(n_mfcc, n_mels, dct_norm).astype(np.float32)

    def _get_output_size(self, output_size):
        if output_size is None:
            return self.n_mfcc
        return output_size

    def stft_to_feature(self, stft_signals):
        xp = _xp(stft_signals)
        power = abs(stft_signals).astype(
            jnp.float32 if xp is jnp else np.float32) ** 2
        # (..., time, freq) @ (freq, n_mels) -> (..., time, n_mels)
        fbank = self.fbank if xp is np else jnp.asarray(self.fbank)
        mel = power @ fbank
        if self.log_mels:
            mel = xp.log(mel + 1e-6)
        else:
            mel = amplitude_to_db(mel, top_db=self.top_db, xp=xp)
        dct = self.dct_mat if xp is np else jnp.asarray(self.dct_mat)
        return mel @ dct

    def init_streaming_state(self):
        return {'max_db': None}

    def streaming_feature(self, block, state):
        """Causal MFCC: the AmplitudeToDB top-db clamp reference max is a
        running max over all frames so far (log_mels=True is frame-local
        and exact)."""
        power = np.abs(block).astype(np.float32) ** 2
        mel = power @ self.fbank
        if self.log_mels:
            return (np.log(mel + 1e-6) @ self.dct_mat), state
        x_db = 10.0 * np.log10(np.clip(mel, 1e-10, None))
        cur = float(x_db.max()) if x_db.size else -np.inf
        prev = state['max_db'] if state['max_db'] is not None else -np.inf
        mx = max(prev, cur)
        state = {'max_db': mx}
        if np.isfinite(mx):
            x_db = np.maximum(x_db, mx - self.top_db)
        return (x_db @ self.dct_mat), state


#: Name used by the reference's configs.
TorchMFCC = MFCC


# ---------------------------------------------------------------------------
# Concatenation
# ---------------------------------------------------------------------------

class ConcatenatedSTFTFeatures(STFTFeatures):
    """fe1 ⊕ fe2 on a shared STFT (reference ``feature_extractor.py:290-367``)."""

    @classmethod
    def finalize_dogmatic_config(cls, config):
        for fe in ['fe1', 'fe2']:
            if fe not in config:
                continue
            for key in ['size', 'shift', 'pad', 'fading', 'window']:
                if key in config:
                    config[fe][key] = config[key]
            if config.get('window_length') is not None:
                config[fe]['window_length'] = config['window_length']
        super().finalize_dogmatic_config(config)
        for fe in ['fe1', 'fe2']:
            if fe in config:
                config[fe]['window_length'] = config['window_length']

    def __init__(self, fe1, fe2, output_size=None, size=1024, shift=256,
                 window='blackman', window_length=None, pad=True, fading=True):
        self._fes = (fe1, fe2)
        super().__init__(size=size, shift=shift, window_length=window_length,
                         pad=pad, fading=fading, output_size=output_size,
                         window=window)
        self.fe1 = fe1
        self.fe2 = fe2

    def _get_output_size(self, output_size):
        fe1, fe2 = self._fes
        if output_size is None:
            return fe1.output_size + fe2.output_size
        return output_size

    def stft_to_feature(self, stft_signals):
        xp = _xp(stft_signals)
        return xp.concatenate(
            [self.fe1.stft_to_feature(stft_signals),
             self.fe2.stft_to_feature(stft_signals)],
            axis=-1,
        )

    def init_streaming_state(self):
        return (self.fe1.init_streaming_state(),
                self.fe2.init_streaming_state())

    def streaming_feature(self, block, state):
        f1, s1 = self.fe1.streaming_feature(block, state[0])
        f2, s2 = self.fe2.streaming_feature(block, state[1])
        return np.concatenate([np.asarray(f1), np.asarray(f2)], axis=-1), \
            (s1, s2)


#: Alias with the reference's (misspelled) class name so its YAML configs load.
ConcaternatedSTFTFeatures = ConcatenatedSTFTFeatures
