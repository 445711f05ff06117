"""Micro-benchmark of the BLSTM recurrence on the real chip.

Sweeps the Pallas kernel blocking (BATCH_BLOCK x TIME_BLOCK) at the
flagship post-net dims (B=2048 folded speakers, T=316, H=300 -> 4H=1200),
one subprocess per point (the kernel constants are module-level).

Usage:
  python tools/bench_lstm.py              # run the sweep
  python tools/bench_lstm.py --one        # single point from env, prints ms
"""

import json
import os
import subprocess
import sys
import time


def run_one():
    import jax
    import jax.numpy as jnp
    from tssep_tpu.nn.init import torch_lstm_init
    from tssep_tpu.kernels.blstm import blstm_apply_fused

    B = int(os.environ.get('LSTMB_B', '2048'))
    T = int(os.environ.get('LSTMB_T', '316'))
    I = int(os.environ.get('LSTMB_I', '320'))
    H = int(os.environ.get('LSTMB_H', '300'))
    iters = int(os.environ.get('LSTMB_ITERS', '5'))

    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, I), jnp.bfloat16)
    params = torch_lstm_init(jax.random.PRNGKey(1), I, H)
    params.update({k + '_reverse': v for k, v in
                   torch_lstm_init(jax.random.PRNGKey(2), I, H).items()})

    fwd = jax.jit(lambda p, x: jnp.sum(blstm_apply_fused(
        p, x, hidden_size=H, bidirectional=True)))
    bwd = jax.jit(jax.value_and_grad(lambda x: jnp.sum(blstm_apply_fused(
        params, x, hidden_size=H, bidirectional=True) ** 2)))

    def bench(fn):
        float(fn(x))          # compile+warm
        # dedup-defeating perturbation must survive bf16 rounding
        # (bf16 eps ~8e-3: x + 1e-6 == x and the relay dedups the call)
        import jax.numpy as jnp
        xs = [(x.astype(jnp.float32) * (1 + 0.01 * (i + 1))
               ).astype(x.dtype) for i in range(iters)]
        for xi in xs:
            xi.block_until_ready()
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(xs[i])
        float(out)
        return (time.perf_counter() - t0) / iters * 1000

    t_f = bench(lambda x: fwd(params, x))
    t_b = bench(lambda x: bwd(x)[0])
    print(json.dumps({'fwd_ms': t_f, 'fwd_bwd_ms': t_b}))


def run_one_guarded():
    try:
        run_one()
    except Exception as e:  # noqa: BLE001
        print('POINT FAILED:', type(e).__name__, str(e)[:300])
        sys.exit(1)


def sweep():
    points = []
    for bidi in ('0', '1'):
        for bb in (256, 512, 1024, 2048):
            for tb in (4, 8):
                points.append((bidi, bb, tb))
    for bidi, bb, tb in points:
        env = dict(os.environ,
                   TSSEP_LSTM_DTYPE='bfloat16',
                   TSSEP_PALLAS_BIDI=bidi,
                   TSSEP_PALLAS_BATCH_BLOCK=str(bb),
                   TSSEP_PALLAS_TIME_BLOCK=str(tb),
                   LSTMB_ITERS=os.environ.get('LSTMB_ITERS', '3'))
        try:
            r = subprocess.run(
                [sys.executable, __file__, '--one'], env=env,
                capture_output=True, text=True, timeout=600)
        except subprocess.TimeoutExpired:
            print(f'bidi={bidi} bb={bb:4d} tb={tb:2d}: TIMEOUT', flush=True)
            continue
        out = [ln for ln in r.stdout.splitlines() if ln.startswith('{')]
        if r.returncode == 0 and out:
            d = json.loads(out[-1])
            print(f'bidi={bidi} bb={bb:4d} tb={tb:2d}: '
                  f'fwd {d["fwd_ms"]:7.2f} ms  '
                  f'f+b {d["fwd_bwd_ms"]:7.2f} ms', flush=True)
        else:
            err = (r.stderr or r.stdout).strip().splitlines()
            print(f'bidi={bidi} bb={bb:4d} tb={tb:2d}: FAILED '
                  f'{err[-1][:160] if err else r.returncode}', flush=True)


if __name__ == '__main__':
    if '--one' in sys.argv:
        run_one_guarded()
    else:
        sweep()
