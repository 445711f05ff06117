"""On-device meeting simulation (data/device_sim.py) — CPU-jax smoke +
contract tests (the module's normal home is the TPU, where it removes the
host->device transfer entirely)."""

import jax
import numpy as np
import pytest

from tssep_tpu.data.device_sim import DeviceMeetingSimulator, DeviceSimDataset


@pytest.fixture(scope='module')
def sim():
    # keep f0s below Nyquist at the tiny test sample rate — otherwise a
    # speaker's harmonics all fall outside the band and its enrollment is
    # silent (zero embedding), which is a degenerate config, not a bug
    return DeviceMeetingSimulator(sample_rate=800, duration=1.0,
                                  num_speakers=4, aux_size=33,
                                  f0_min=60.0, f0_max=180.0)


def test_generate_contract(sim):
    batch = sim.generate(jax.random.PRNGKey(0), batch=2)
    obs = np.asarray(batch['observation'])
    assert obs.shape == (2, 1, sim.num_samples)
    assert np.isfinite(obs).all()
    vad = np.asarray(batch['Vad'])                    # frame-domain
    assert vad.shape[:2] == (2, 4)
    assert vad.any() and not vad.all()
    aux = np.asarray(batch['auxInput'])
    assert aux.shape == (2, 4, 33)
    tgt = np.asarray(batch['speaker_reverberation_early_ch0'])
    assert tgt.shape == (2, 4, sim.num_samples)
    # sources are gated by the (fixed staircase) sample-domain layout
    sample_vad = np.asarray(sim._vad, dtype=bool)     # (S, T)
    assert np.abs(tgt[:, ~sample_vad]).max() == 0
    assert np.abs(tgt[:, sample_vad]).max() > 0


def test_generate_deterministic_per_key(sim):
    a = sim.generate(jax.random.PRNGKey(7), batch=1)
    b = sim.generate(jax.random.PRNGKey(7), batch=1)
    c = sim.generate(jax.random.PRNGKey(8), batch=1)
    np.testing.assert_array_equal(np.asarray(a['observation']),
                                  np.asarray(b['observation']))
    assert np.abs(np.asarray(a['observation'])
                  - np.asarray(c['observation'])).max() > 0


def test_dataset_protocol(sim):
    ds = DeviceSimDataset(sim, batch=2, seed=3)
    it = iter(ds)
    first = next(it)
    second = next(it)
    assert 'observation' in first and 'Vad' in first
    assert 'speaker_reverberation_early_ch0' not in first  # not in targets
    assert first['dataset'] == ['train', 'train']
    # infinite, never-repeating: consecutive batches differ
    assert np.abs(np.asarray(first['observation'])
                  - np.asarray(second['observation'])).max() > 0


def test_embeddings_discriminate_speakers(sim):
    batch = sim.generate(jax.random.PRNGKey(0), batch=1)
    aux = np.asarray(batch['auxInput'])[0]          # (S, A)
    aux = aux / (np.linalg.norm(aux, axis=-1, keepdims=True) + 1e-9)
    gram = aux @ aux.T
    off = gram[~np.eye(len(gram), dtype=bool)]
    # distinct f0/timbre -> own embedding much closer to itself than others
    assert np.all(np.diag(gram) > 0.99)
    assert off.mean() < 0.9
