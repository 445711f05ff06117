"""Compile-check the CONDFUSE kernel at flagship shapes on the TPU.

The round-3 Mosaic failure ("infer-vector-layout: unsupported shape
cast", kernels/blstm.py cond broadcast) only appeared at flagship dims
(bbB=16+, S=8, F=300) — the small-shape numerics check compiled fine.
This drives fwd AND bwd compilation at the real sizes without running a
full bench.

Usage: [TSSEP_PALLAS_BATCH_BLOCK=256] python tools/check_condfuse_compile.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault('TSSEP_LSTM_DTYPE', 'bfloat16')

import jax
import jax.numpy as jnp

from tssep_tpu.kernels import blstm as kb
from tssep_tpu.nn.init import torch_lstm_init


def main():
    B, S, T, F, H = 32, 8, 316, 300, 300
    xs = jax.random.normal(jax.random.PRNGKey(0), (B, T, F), jnp.bfloat16)
    aux = jax.random.normal(jax.random.PRNGKey(1), (B, S, F), jnp.bfloat16)
    params = torch_lstm_init(jax.random.PRNGKey(2), F, H)
    params.update({k + '_reverse': v for k, v in
                   torch_lstm_init(jax.random.PRNGKey(3), F, H).items()})

    def loss(p, xs, aux):
        return jnp.sum(
            kb.blstm_layer_fullfused_cond(p, xs, aux).astype(jnp.float32)
            ** 2)

    print('compiling fwd...')
    f = jax.jit(lambda p, xs, aux: kb.blstm_layer_fullfused_cond(
        p, xs, aux)).lower(params, xs, aux).compile()
    print('fwd compiled OK')
    print('compiling fwd+bwd...')
    g = jax.jit(jax.grad(loss, argnums=(1, 2))).lower(
        params, xs, aux).compile()
    print('bwd compiled OK')
    out = f(params, xs, aux)
    dxs, daux = g(params, xs, aux)
    print('fwd out', out.shape, float(jnp.sum(out.astype(jnp.float32))))
    print('dxs finite:', bool(jnp.isfinite(
        jnp.sum(dxs.astype(jnp.float32)))))
    print('daux finite:', bool(jnp.isfinite(
        jnp.sum(daux.astype(jnp.float32)))))
    print('CONDFUSE FLAGSHIP-SHAPE COMPILE OK')


if __name__ == '__main__':
    main()
