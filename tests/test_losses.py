"""Loss golden-value parity vs the reference doctests.

The reference pins values on ``torch.manual_seed(0)`` fixtures
(``/root/reference/tssep/train/loss.py:183-299``); we reproduce the exact
fixtures with torch (CPU) and feed them through the JAX losses.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')

from tssep_tpu.tasks.losses import (  # noqa: E402
    LogMAE, MAE, MSE, VADSigmoidBCE, FreqMSE,
)


@pytest.fixture()
def seeded_pair():
    torch.manual_seed(0)
    target = torch.rand((2, 10000))
    estimate = target + 0.5 * torch.rand((2, 10000))
    return jnp.asarray(estimate.numpy()), jnp.asarray(target.numpy())


def test_mse_golden(seeded_pair):
    estimate, target = seeded_pair
    np.testing.assert_allclose(float(MSE(pit=False)(estimate, target)),
                               0.1673, atol=5e-5)
    assert float(MSE(pit=False)(target, target)) == 0


def test_mae_golden(seeded_pair):
    estimate, target = seeded_pair
    np.testing.assert_allclose(float(MAE(pit=False)(estimate, target)),
                               0.5018, atol=5e-5)
    assert float(MAE(pit=False)(target, target)) == 0


def test_logmae_golden(seeded_pair):
    estimate, target = seeded_pair
    np.testing.assert_allclose(float(LogMAE(pit=False)(estimate, target)),
                               -0.2995, atol=5e-5)
    assert float(LogMAE(pit=False)(target, target)) == -np.inf
    # zeroed second speaker halves the sum (loss.py:231-233)
    e = np.asarray(estimate).copy()
    t = np.asarray(target).copy()
    e[1, :] = 0
    t[1, :] = 0
    np.testing.assert_allclose(
        float(LogMAE(pit=False)(jnp.asarray(e), jnp.asarray(t))),
        -0.5980, atol=5e-5)


def test_freqmse_golden():
    torch.manual_seed(0)
    target = torch.rand((2, 10000))
    estimate = target + 0.5 * torch.rand((2, 10000))
    np.testing.assert_allclose(
        float(FreqMSE(pit=False)(jnp.asarray(estimate.numpy()),
                                 jnp.asarray(target.numpy()))),
        0.1673, atol=5e-5)


class TestVADSigmoidBCE:
    @pytest.fixture()
    def fixture(self):
        torch.manual_seed(0)
        target = torch.rand((2, 100, 257))
        estimate = target + 0.5 * torch.rand((2, 100, 257))
        return (jnp.asarray(estimate.numpy()), jnp.asarray(target.numpy()))

    def test_goldens(self, fixture):
        estimate, target = fixture
        loss = VADSigmoidBCE(pit=False, target='Speaker_reverberation_early')
        np.testing.assert_allclose(float(loss(estimate, target).sum()),
                                   0.3867 * 1, atol=5e-4)
        assert loss.prepare_target(target).shape == (2, 100)
        t_np = np.asarray(target)
        for scale, want in [(500, 0.0), (10, 0.0111), (1, 0.4932)]:
            est = jnp.asarray(
                ((np.abs(t_np) > 0.05).astype(np.float32) - 0.5) * scale)
            got = float(loss(est, target).sum())
            np.testing.assert_allclose(got, want, atol=5e-4)

    def test_vad_target_passthrough(self):
        logits = jnp.zeros((2, 3, 10, 5))
        target = jnp.ones((2, 3, 10))
        loss = VADSigmoidBCE(target='Vad')
        got = loss(logits, target)
        np.testing.assert_allclose(np.asarray(got),
                                   np.log(2) * np.ones(2), rtol=1e-6)


def test_pit_finds_best_permutation():
    rng = np.random.RandomState(0)
    t = rng.rand(3, 100).astype(np.float32)
    # estimate = permuted target
    e = t[[2, 0, 1]]
    loss = MAE(pit=True)
    got = float(loss(jnp.asarray(e), jnp.asarray(t)))
    np.testing.assert_allclose(got, 0.0, atol=1e-7)
    # and without pit it's large
    assert float(MAE(pit=False)(jnp.asarray(e), jnp.asarray(t))) > 0.1
