"""On-device meeting simulation: the corpus is generated on the TPU.

Host->device bandwidth is the scarcest resource of a training step fed with
fresh audio (and on tunneled dev runtimes it is catastrophically scarce);
generating the meetings *on the accelerator* removes the transfer entirely
and gives an infinite, never-repeating corpus (no overfitting):

- a jitted generator produces a full training batch from a PRNG key:
  harmonic 'speakers' (log-uniform f0, per-speaker timbre amplitudes,
  random phases/modulation), the staircase overlap layout, SNR-scaled
  noise, and gate-style enrollment embeddings computed from an on-device
  enrollment STFT;
- ``DeviceSimDataset`` adapts it to the trainer's dataset protocol
  (infinite; each batch a fresh fold of the key).

Statistically matches ``tssep_tpu.data.simulate.MeetingSimulator``'s
'gate' configuration (same layout, SNR, f0/timbre distributions).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tssep_tpu.data.dummy import staircase_vad
from tssep_tpu.signal.stft import STFT

__all__ = ['DeviceMeetingSimulator', 'DeviceSimDataset']


@dataclasses.dataclass(frozen=True)
class DeviceMeetingSimulator:
    sample_rate: int = 16000
    duration: float = 5.0
    num_speakers: int = 8
    aux_size: int = 513
    snr_db: float = 10.0
    n_harmonics: int = 8
    f0_min: float = 90.0
    f0_max: float = 900.0
    enroll_seconds: float = 1.0

    @property
    def num_samples(self):
        return int(self.sample_rate * self.duration)

    @functools.cached_property
    def _vad(self):
        return staircase_vad(self.num_samples, self.num_speakers)

    @functools.cached_property
    def _frame_vad(self):
        from tssep_tpu.signal.vad import stft_vad
        fe = self._gate_stft
        return np.asarray(
            stft_vad(self._vad, 1024, 256, True), dtype=np.float32)

    @functools.cached_property
    def _gate_stft(self):
        return STFT(size=2 * (self.aux_size - 1),
                    shift=(2 * (self.aux_size - 1)) // 4, window='hann')

    # ------------------------------------------------------------------
    def _sources(self, key, num_samples, f0s, amps):
        """Harmonic sources. f0s: (B, S); amps: (B, S, H) -> (B, S, T)."""
        b, s = f0s.shape
        h = self.n_harmonics
        t = jnp.arange(num_samples, dtype=jnp.float32) / self.sample_rate
        k_phase, k_am_f, k_am_p = jax.random.split(key, 3)
        phases = jax.random.uniform(k_phase, (b, s, h), maxval=2 * np.pi)
        freqs = f0s[..., None] * jnp.arange(1, h + 1)        # (B, S, H)
        # mask harmonics beyond ~Nyquist
        alive = (freqs < 0.95 * self.sample_rate / 2).astype(jnp.float32)
        coeff = amps * alive                                  # (B, S, H)
        # Harmonic bank via the complex-exponential power chain:
        # sin(h*w*t + p_h) = cos(p_h)*Im(z^h) + sin(p_h)*Re(z^h) with
        # z = e^{i*w*t}.  ONE sin+cos per (B, S, T) element + cheap
        # complex multiplies per harmonic, instead of H sin evaluations
        # over the (B, S, H, T) tensor — at bench dims that tensor is
        # 1.3e9 elements and its transcendentals dominated the on-device
        # input pipeline's share of the train step (TPU_R5J 'gen' stage).
        ang = (2 * np.pi) * f0s[..., None] * t                # (B, S, T)
        zr, zi = jnp.cos(ang), jnp.sin(ang)
        cp, sp = jnp.cos(phases), jnp.sin(phases)             # (B, S, H)
        hr, hi = zr, zi                                       # z^1
        sig = coeff[..., 0, None] * (cp[..., 0, None] * hi
                                     + sp[..., 0, None] * hr)
        for k in range(1, h):
            hr, hi = hr * zr - hi * zi, hr * zi + hi * zr     # z^(k+1)
            sig = sig + coeff[..., k, None] * (cp[..., k, None] * hi
                                               + sp[..., k, None] * hr)
        am_f = jax.random.uniform(k_am_f, (b, s, 1), minval=1.0, maxval=4.0)
        am_p = jax.random.uniform(k_am_p, (b, s, 1), maxval=2 * np.pi)
        am = 0.5 + 0.5 * jnp.sin(2 * np.pi * am_f * t + am_p)
        return sig * am

    def _gate_embedding(self, enroll):
        """enroll: (B, S, T_e) -> (B, S, aux_size) in [0, 1]."""
        spec = jnp.abs(self._gate_stft.stft(enroll))
        profile = jnp.mean(spec ** 2, axis=-2)
        padded = jnp.pad(profile, [(0, 0)] * (profile.ndim - 1) + [(1, 1)])
        profile = (padded[..., :-2] + padded[..., 1:-1] + padded[..., 2:]) / 3
        gate = profile / jnp.maximum(
            profile.max(axis=-1, keepdims=True), 1e-12)
        return jnp.sqrt(gate)

    # ------------------------------------------------------------------
    def generate(self, key, batch: int):
        """-> batch dict (observation, auxInput, Vad, vad-free) on device."""
        s = self.num_speakers
        k_f0, k_amp, k_src, k_enr, k_noise = jax.random.split(key, 5)
        f0s = jnp.exp(jax.random.uniform(
            k_f0, (batch, s), minval=np.log(self.f0_min),
            maxval=np.log(self.f0_max)))
        amps = (jax.random.uniform(k_amp, (batch, s, self.n_harmonics),
                                   minval=0.05, maxval=1.0)
                / jnp.arange(1, self.n_harmonics + 1))

        sources = self._sources(k_src, self.num_samples, f0s, amps)
        vad = jnp.asarray(self._vad, dtype=jnp.float32)
        gated = sources * vad[None]

        speech = gated.sum(axis=1)                            # (B, T)
        noise = jax.random.normal(k_noise, speech.shape)
        speech_power = jnp.mean(speech ** 2, axis=-1, keepdims=True) + 1e-12
        noise = noise * jnp.sqrt(
            speech_power / jnp.mean(noise ** 2, axis=-1, keepdims=True)
            / (10 ** (self.snr_db / 10)))
        observation = (speech + noise)[:, None, :]            # (B, 1, T)

        n_enroll = int(self.sample_rate * self.enroll_seconds)
        enroll = self._sources(k_enr, n_enroll, f0s, amps)
        aux = self._gate_embedding(enroll)

        return {
            'observation': observation,
            'auxInput': aux.astype(jnp.float32),
            'Vad': jnp.broadcast_to(
                jnp.asarray(self._frame_vad)[None],
                (batch,) + self._frame_vad.shape),
            'speaker_reverberation_early_ch0': gated,
            'reference_channel': 0,
        }


class DeviceSimDataset:
    """Infinite dataset protocol over the jitted generator."""

    def __init__(self, simulator: DeviceMeetingSimulator, batch: int,
                 seed: int = 0, targets=('Vad',)):
        self.simulator = simulator
        self.batch = batch
        self.seed = seed
        self.targets = set(targets)
        self._gen = jax.jit(functools.partial(simulator.generate,
                                              batch=batch))

    def __iter__(self):
        key = jax.random.PRNGKey(self.seed)
        while True:
            key, sub = jax.random.split(key)
            ex = dict(self._gen(sub))
            if 'Vad' not in self.targets:
                ex.pop('Vad')
            if 'speaker_reverberation_early_ch0' not in self.targets:
                ex.pop('speaker_reverberation_early_ch0')
            ex['dataset'] = ['train'] * self.batch
            yield ex

    def tile(self, reps=None):
        return self

    def __repr__(self):
        return (f'DeviceSimDataset(batch={self.batch}, '
                f'{self.simulator!r})')
