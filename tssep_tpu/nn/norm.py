"""Parameter-free normalizers (reference ``tssep/train/net.py:250-330``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tssep_tpu.config.configurable import Configurable

__all__ = ['InstanceNorm', 'InstanceNorm_v2']


def _xp(x):
    return jnp if isinstance(x, jnp.ndarray) and not isinstance(x, np.ndarray) else np


class InstanceNorm(Configurable):
    """(x - mean) / std along ``dim`` (biased std by default, like torch
    InstanceNorm1d)."""

    def __init__(self, dim=-1, unbiased=False):
        self.dim = dim
        self.unbiased = unbiased

    def __call__(self, x):
        xp = _xp(x)
        mean = xp.mean(x, axis=self.dim, keepdims=True)
        ddof = 1 if self.unbiased else 0
        std = xp.std(x, axis=self.dim, keepdims=True, ddof=ddof)
        return (x - mean) / std

    def __repr__(self):
        return f'InstanceNorm(dim={self.dim}, unbiased={self.unbiased})'


class InstanceNorm_v2(Configurable):
    """Mean-subtract along ``mean_dim``, L2-normalize (rms) along ``norm_dim``."""

    def __init__(self, mean_dim=-1, norm_dim=-1):
        self.mean_dim = mean_dim
        self.norm_dim = norm_dim

    def __call__(self, x):
        xp = _xp(x)
        x = x - xp.mean(x, axis=self.mean_dim, keepdims=True)
        norm = xp.linalg.norm(x, axis=self.norm_dim, keepdims=True)
        norm = norm / np.sqrt(x.shape[self.norm_dim])
        return x / norm

    def __repr__(self):
        return f'InstanceNorm_v2(mean_dim={self.mean_dim}, norm_dim={self.norm_dim})'
