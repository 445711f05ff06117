"""Micro-benchmark of the BLSTM recurrence on the real chip.

Sweeps the Pallas kernel blocking (BATCH_BLOCK x TIME_BLOCK) at the
flagship post-net dims (B=2048 folded speakers, T=316, H=300 -> 4H=1200)
and prints ms per layer (fwd and fwd+bwd) for each point, plus the scan
backend for comparison.

Usage: python tools/bench_lstm.py [--quick]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    # Host transfer is the only true sync on the relay runtime.
    return float(jnp.sum(x))


def bench(fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        # vary input to defeat relay dedup
        args = (args[0] + 1e-6 * i,) + args[1:]
        out = fn(*args)
        sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    os.environ.setdefault('TSSEP_LSTM_DTYPE', 'bfloat16')
    B, T, I, H = 2048, 316, 320, 300
    if '--quick' in sys.argv:
        iters = 3
    else:
        iters = 5
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, I), dt)
    from tssep_tpu.nn.init import torch_lstm_init
    params = torch_lstm_init(jax.random.PRNGKey(1), I, H)
    params.update({k + '_reverse': v for k, v in
                   torch_lstm_init(jax.random.PRNGKey(2), I, H).items()})

    results = {}

    # scan backend
    from tssep_tpu.nn import rnnp
    f_scan = jax.jit(lambda p, x: rnnp._blstm_apply_impl(p, x, H, True))
    g_scan = jax.jit(jax.grad(
        lambda p, x: jnp.sum(rnnp._blstm_apply_impl(p, x, H, True) ** 2)))
    try:
        results['scan fwd'] = bench(lambda x: f_scan(params, x), x,
                                    iters=iters)
        results['scan f+b'] = bench(lambda x: jax.tree_util.tree_leaves(
            g_scan(params, x))[0], x, iters=iters)
    except Exception as e:  # noqa: BLE001
        print('scan failed:', e)

    for bb in (128, 256, 512, 1024, 2048):
        for tb in (4, 8, 16):
            os.environ['TSSEP_PALLAS_BATCH_BLOCK'] = str(bb)
            os.environ['TSSEP_PALLAS_TIME_BLOCK'] = str(tb)
            import importlib
            import tssep_tpu.kernels.blstm as kb
            importlib.reload(kb)
            fwd = jax.jit(lambda p, x: kb.blstm_apply_fused(
                p, x, hidden_size=H, bidirectional=True))
            bwd = jax.jit(jax.grad(lambda p, x: jnp.sum(kb.blstm_apply_fused(
                p, x, hidden_size=H, bidirectional=True) ** 2)))
            tag = f'pallas bb={bb:4d} tb={tb}'
            try:
                t_f = bench(lambda x: fwd(params, x), x, iters=iters)
                t_b = bench(lambda x: jax.tree_util.tree_leaves(
                    bwd(params, x))[0], x, iters=iters)
                results[tag] = (t_f, t_b)
                print(f'{tag}: fwd {t_f:7.2f} ms   f+b {t_b:7.2f} ms',
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f'{tag}: FAILED {type(e).__name__}: {str(e)[:200]}',
                      flush=True)

    print()
    for k, v in results.items():
        print(k, v)


if __name__ == '__main__':
    main()
