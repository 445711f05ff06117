"""Meeting simulation + lightweight speaker embeddings.

The reference trains on simulated LibriSpeech meetings prepared by its
companion repo (``tssep_data``, reference ``README.md:79-82``); this module
provides that capability natively so the full pipeline — simulate → shard →
train → eval — lives in one framework:

- ``SpeakerEmbedder``: enrollment audio -> fixed-size embedding
  (log-mel statistics d-vector-lite, L2-normalized).  Stands in for the
  reference's externally-computed i-vectors; any (spk, aux_size) embedding
  source plugs into the same ``auxInput`` slot.
- ``MeetingSimulator``: synthesizes multi-speaker meetings with partial
  overlap, per-speaker gains, optional multi-channel delay/decay room
  approximation, and noise; yields examples satisfying the reader contract
  (``audio_data.observation``, per-speaker early images, sample VAD,
  ``auxInput``).
- ``simulate_corpus``: writes a corpus into the native shard store
  (``tssep_tpu.runtime.native.ShardWriter``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from tssep_tpu.signal.mel import mel_filterbank
from tssep_tpu.signal.stft import STFT

__all__ = ['SpeakerEmbedder', 'MeetingSimulator', 'simulate_corpus']


class SpeakerEmbedder:
    """Enrollment audio -> (aux_size,) embedding: the speaker's average
    mel-spectral profile (aux_size mel bands), log-compressed, mean-removed
    and L2-normalized — a sharp spectral fingerprint (d-vector-lite).  Any
    stronger embedding source (i-vectors, neural d-vectors) plugs into the
    same ``auxInput`` slot."""

    def __init__(self, aux_size=100, sample_rate=16000, n_mels=None,
                 stft_size=512, stft_shift=160, kind='mel'):
        self.aux_size = aux_size
        self.sample_rate = sample_rate
        self.kind = kind
        if kind == 'gate':
            # spectral-gate fingerprint: aux_size must match the model's
            # STFT bins; values in [0, 1], high where the speaker has
            # energy — the natural partner of 'mul' (LHUC) conditioning.
            stft_size = 2 * (aux_size - 1)
            self.stft = STFT(size=stft_size, shift=stft_size // 4,
                             window='hann')
            self.fbank = None
        else:
            self.stft = STFT(size=stft_size, shift=stft_shift, window='hann')
            self.fbank = mel_filterbank(
                n_freqs=stft_size // 2 + 1, f_min=40,
                f_max=sample_rate // 2 - 100, n_mels=n_mels or aux_size,
                sample_rate=sample_rate)

    def __call__(self, signal):
        spec = np.abs(self.stft.stft(np.asarray(signal, dtype=np.float64)))
        profile = (spec ** 2).mean(axis=-2)
        if self.kind == 'gate':
            # light smoothing + max-normalize -> [0, 1] gate profile
            kernel = np.ones(3) / 3
            profile = np.convolve(profile, kernel, mode='same')
            gate = profile / np.maximum(profile.max(), 1e-12)
            return np.sqrt(gate).astype(np.float32)
        mel = np.log(profile @ self.fbank + 1e-8)
        emb = mel - mel.mean()
        return (emb / np.maximum(np.linalg.norm(emb), 1e-9)).astype(np.float32)


@dataclasses.dataclass
class MeetingSimulator:
    """Synthetic meeting generator (sources default to harmonic 'speakers')."""

    sample_rate: int = 16000
    duration: float = 5.0
    num_speakers: int = 8
    num_channels: int = 1
    aux_size: int = 100
    overlap: float = 0.5           # fraction of each turn overlapping the next
    snr_db: float = 10.0           # speech-to-noise ratio
    reverb_taps: int = 0           # extra delayed/decayed copies per channel
    embedding_kind: str = 'mel'    # 'mel' (d-vector-lite) | 'gate' (spectral)
    seed: int = 0
    #: Size of a FIXED speaker-identity pool shared across simulator
    #: instances (independent of ``seed``): each meeting draws its
    #: speakers from the pool, so train/eval splits share voices — the
    #: closed-speaker-set condition of LibriCSS-style evaluation (the
    #: reference evaluates enrolled, known speakers; reference
    #: tssep/data.py:58-146 consumes precomputed per-speaker i-vectors).
    #: 0 = open set: every meeting gets fresh random voices.
    speaker_pool: int = 0

    def __post_init__(self):
        self.embedder = SpeakerEmbedder(self.aux_size, self.sample_rate,
                                        kind=self.embedding_kind)

    def _speaker_source(self, rng, num_samples, voiced_f0, timbre_seed=None):
        """Harmonic-plus-noise 'speech' with a per-speaker timbre envelope.

        The speaker identity is (f0, timbre): harmonic amplitudes come from
        the timbre seed so enrollment and meeting speech share the same
        spectral fingerprint (as a real voice does), while phases/modulation
        vary per utterance.
        """
        t = np.arange(num_samples) / self.sample_rate
        if timbre_seed is None:
            timbre_seed = int(voiced_f0 * 1000) % (2 ** 31)
        timbre = np.random.RandomState(timbre_seed)
        n_harm = 8
        amps = timbre.uniform(0.05, 1.0, n_harm) / np.arange(1, n_harm + 1)
        sig = np.zeros(num_samples)
        nyquist = self.sample_rate / 2
        for k in range(1, n_harm + 1):
            if voiced_f0 * k >= nyquist * 0.95:
                break
            sig += amps[k - 1] * np.sin(2 * np.pi * voiced_f0 * k * t
                                        + rng.uniform(0, 2 * np.pi))
        am = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(1, 4) * t)
        sig = sig * am + 0.05 * rng.randn(num_samples)
        return sig.astype(np.float32)

    def _turn_layout(self, num_samples):
        """Staircase turns with `overlap` fractional overlap."""
        vad = np.zeros((self.num_speakers, num_samples), dtype=bool)
        start = 0
        for i in range(self.num_speakers):
            end = num_samples * (i + 2) // (self.num_speakers + 1)
            vad[i, start:end] = True
            start = end - int((end - start) * self.overlap)
        return vad

    def example(self, index):
        rng = np.random.RandomState(self.seed * 100_003 + index)
        num_samples = int(self.sample_rate * self.duration)
        c = self.num_channels
        s = self.num_speakers

        # log-uniform f0 spread + per-speaker timbre -> discriminable
        # spectral fingerprints (like distinct voices)
        if self.speaker_pool:
            ids = rng.choice(self.speaker_pool, size=s,
                             replace=self.speaker_pool < s)
            pool = [np.random.RandomState(911_000_003 + int(i))
                    for i in ids]
            f0s = np.array([np.exp(pr.uniform(np.log(90), np.log(900)))
                            for pr in pool])
            timbres = np.array([pr.randint(0, 2 ** 31) for pr in pool])
        else:
            f0s = np.exp(rng.uniform(np.log(90), np.log(900), size=s))
            timbres = rng.randint(0, 2 ** 31, size=s)
        sources = np.stack([
            self._speaker_source(rng, num_samples, f0, int(ts))
            for f0, ts in zip(f0s, timbres)])                # (S, T)
        vad = self._turn_layout(num_samples)
        sources = sources * vad

        # Channel images: per-channel delay + decaying taps
        images = np.zeros((s, c, num_samples), dtype=np.float32)
        for spk in range(s):
            for ch in range(c):
                delay = 0 if ch == 0 else rng.randint(0, 8)
                img = np.roll(sources[spk], delay)
                img[:delay] = 0
                for tap in range(self.reverb_taps):
                    d = rng.randint(40, 400)
                    g = 0.5 ** (tap + 1) * rng.uniform(0.3, 1.0)
                    tail = np.roll(sources[spk], delay + d) * g
                    tail[:delay + d] = 0
                    img = img + tail
                images[spk, ch] = img

        speech = images.sum(axis=0)                          # (C, T)
        speech_power = np.mean(speech ** 2) + 1e-12
        noise = rng.randn(c, num_samples).astype(np.float32)
        noise *= np.sqrt(speech_power / np.mean(noise ** 2)
                         / (10 ** (self.snr_db / 10)))
        observation = speech + noise

        # Enrollment: a clean solo utterance per speaker (same voice
        # identity, fresh phases/modulation) -> embedding
        aux = np.stack([
            self.embedder(self._speaker_source(
                np.random.RandomState(self.seed * 7919 + 17 * spk),
                self.sample_rate, f0s[spk], int(timbres[spk])))
            for spk in range(s)])

        return {
            'example_id': f'sim_{index}',
            'num_samples': num_samples,
            'audio_data': {
                'observation': observation,
                'speaker_reverberation_early_ch0': images[:, 0],
                'vad': vad,
            },
            'auxInput': aux.astype(np.float32),
            'dataset': 'simulated',
        }

    def __iter__(self):
        i = 0
        while True:
            yield self.example(i)
            i += 1


def simulate_corpus(shard_path, num_examples, simulator: MeetingSimulator = None,
                    **kwargs):
    """Simulate ``num_examples`` meetings into a native shard file."""
    from tssep_tpu.runtime.native import ShardWriter
    if simulator is None:
        simulator = MeetingSimulator(**kwargs)
    with ShardWriter(shard_path) as w:
        for i in range(num_examples):
            ex = simulator.example(i)
            w.add_example(ex['example_id'], {
                'observation': ex['audio_data']['observation'],
                'speaker_reverberation_early_ch0':
                    ex['audio_data']['speaker_reverberation_early_ch0'],
                'vad': ex['audio_data']['vad'],
                'auxInput': ex['auxInput'],
            })
    return shard_path
