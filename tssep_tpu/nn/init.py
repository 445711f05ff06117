"""Parameter initializers matching torch's default distributions.

Not bit-identical (different RNG), but the same families/ranges, so training
dynamics match the reference:
- ``torch.nn.Linear``: weight kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in),
  1/sqrt(fan_in)); bias U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
- ``torch.nn.LSTM``: every tensor U(-1/sqrt(hidden), 1/sqrt(hidden)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['torch_linear_init', 'torch_lstm_init', 'torch_gru_init',
           'uniform']


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_init(key, in_features: int, out_features: int, bias=True,
                      dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_features)
    params = {'weight': uniform(kw, (out_features, in_features), bound, dtype)}
    if bias:
        params['bias'] = uniform(kb, (out_features,), bound, dtype)
    return params


def torch_lstm_init(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    k = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden_size)
    return {
        'weight_ih_l0': uniform(k[0], (4 * hidden_size, input_size), bound, dtype),
        'weight_hh_l0': uniform(k[1], (4 * hidden_size, hidden_size), bound, dtype),
        'bias_ih_l0': uniform(k[2], (4 * hidden_size,), bound, dtype),
        'bias_hh_l0': uniform(k[3], (4 * hidden_size,), bound, dtype),
    }


def torch_gru_init(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    """``torch.nn.GRU`` layout: 3 gates (r, z, n), every tensor
    U(-1/sqrt(hidden), 1/sqrt(hidden))."""
    k = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden_size)
    return {
        'weight_ih_l0': uniform(k[0], (3 * hidden_size, input_size), bound, dtype),
        'weight_hh_l0': uniform(k[1], (3 * hidden_size, hidden_size), bound, dtype),
        'bias_ih_l0': uniform(k[2], (3 * hidden_size,), bound, dtype),
        'bias_hh_l0': uniform(k[3], (3 * hidden_size,), bound, dtype),
    }
