"""Micro-benchmark of one BLSTM layer through the real dispatch
(rnnp.blstm_apply — honors TSSEP_PALLAS_FULLFUSE / LAYER_VJP /
TSSEP_LSTM_REMAT / block envs), at the flagship folded post-net dims.

Separates fwd and fwd+bwd cost of the layer from the rest of the step —
the step profiler showed fwd near roofline but bwd ~9x fwd; this
localizes where the backward time goes.

Usage:
  TSSEP_PALLAS_FULLFUSE=1 TSSEP_PALLAS_BATCH_BLOCK=256 \
      python tools/bench_layer.py
Env: LAYERB_B/T/I/H/ITERS.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault('TSSEP_LSTM_DTYPE', 'bfloat16')
os.environ.setdefault('TSSEP_LSTM_IMPL', 'pallas')

import jax
import jax.numpy as jnp

from tssep_tpu.nn import rnnp
from tssep_tpu.nn.init import torch_lstm_init


def main():
    B = int(os.environ.get('LAYERB_B', '2048'))
    T = int(os.environ.get('LAYERB_T', '316'))
    I = int(os.environ.get('LAYERB_I', '320'))  # noqa: E741
    H = int(os.environ.get('LAYERB_H', '300'))
    iters = int(os.environ.get('LAYERB_ITERS', '5'))

    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, I), jnp.bfloat16)
    params = torch_lstm_init(jax.random.PRNGKey(1), I, H)
    params.update({k + '_reverse': v for k, v in
                   torch_lstm_init(jax.random.PRNGKey(2), I, H).items()})

    fwd = jax.jit(lambda p, x: jnp.sum(
        rnnp.blstm_apply(p, x, hidden_size=H).astype(jnp.float32)))
    bwd = jax.jit(jax.grad(lambda p, x: jnp.sum(
        rnnp.blstm_apply(p, x, hidden_size=H).astype(jnp.float32) ** 2),
        argnums=1))

    def bench(fn, red):
        float(red(fn(params, x)))  # compile + warm (true sync)
        # dedup-defeating perturbation must survive bf16 rounding
        # (bf16 eps ~8e-3: x*(1+1e-6) == x and the relay dedups the call)
        xs = [(x.astype(jnp.float32) * (1 + 0.01 * (i + 1))
               ).astype(x.dtype) for i in range(iters)]
        for xi in xs:
            xi.block_until_ready()
        t0 = time.perf_counter()
        for xi in xs:
            out = fn(params, xi)
        float(red(out))
        return (time.perf_counter() - t0) / iters * 1000

    t_f = bench(fwd, lambda o: o)
    t_b = bench(bwd, lambda o: jnp.sum(o.astype(jnp.float32)))
    print(json.dumps({
        'B': B, 'T': T, 'I': I, 'H': H,
        'fullfuse': rnnp.FULLFUSE, 'layer_vjp': rnnp.LAYER_VJP,
        'remat': rnnp.DEFAULT_REMAT,
        'bb': os.environ.get('TSSEP_PALLAS_BATCH_BLOCK'),
        'tb': os.environ.get('TSSEP_PALLAS_TIME_BLOCK'),
        'fwd_ms': round(t_f, 2), 'fwd_bwd_ms': round(t_b, 2)}))


if __name__ == '__main__':
    main()
