"""Per-stage timing of the flagship bench model on the real chip.

Runs layer_time_report (fwd-only, per-stage) plus fwd / fwd+bwd / full
update timings of the jitted step — shows where the step time goes.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault('TSSEP_LSTM_IMPL', 'pallas')
os.environ.setdefault('TSSEP_LSTM_DTYPE', 'bfloat16')
os.environ.setdefault('TSSEP_PALLAS_BATCH_BLOCK', '128')
os.environ.setdefault('TSSEP_COMPUTE_DTYPE', 'bfloat16')
os.environ.setdefault('TSSEP_PALLAS_TIME_BLOCK', '4')
os.environ.setdefault('TSSEP_DFT_PRECISION', 'default')

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tssep_tpu.tasks.model import Model
    from tssep_tpu.train.optimizer import Adam
    from tssep_tpu.train.track import layer_time_report

    batch = int(os.environ.get('BENCH_BATCH', '256'))
    model = Model.new({
        'fe': {'size': 1024, 'shift': 256, 'window': 'hann'},
        'reader': {'aux_size': 513},
        'mask_estimator': {
            'units': 300, 'projs': 320, 'combination': 'mul', 'ts_vad': 8,
            'aux_net_output_size': 513, 'num_averaged_permutations': 1,
            'output_resolution': 'tf',
        },
    })
    params = model.init_params(jax.random.PRNGKey(0))

    ds = model.prepare_validate_dataset(prefetch=False, batch_size=4)
    ex = next(iter(ds))
    arrays = {k: v for k, v in ex.items()
              if hasattr(v, 'shape') or k == 'reference_channel'}
    reps = -(-batch // 4)
    for k, v in arrays.items():
        if hasattr(v, 'shape') and v.ndim >= 1:
            arrays[k] = jnp.concatenate([v] * reps, axis=0)[:batch]

    print(f'=== per-stage fwd timing (batch {batch}) ===')
    print(layer_time_report(model, params, arrays, iters=3))

    # whole-graph timings
    def timed(tag, jfn, obs, iters=5):
        out = jfn(obs)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        # Chained timing, ONE sync at the end: a per-iteration host sync
        # adds a ~150 ms relay round trip to every sample.  Perturbations
        # must survive bf16 rounding (eps ~8e-3) or the relay dedups the
        # execution entirely.
        per = [(obs.astype(jnp.float32) * (1 + 0.01 * (i + 1))
                ).astype(obs.dtype) for i in range(iters)]
        for p in per:
            p.block_until_ready()
        t0 = time.perf_counter()
        for p in per:
            out = jfn(p)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        print(f'{tag}: {(time.perf_counter() - t0) / iters * 1000:.1f} ms '
              f'(chained x{iters}, single sync)')

    key = jax.random.PRNGKey(1)
    obs = jnp.asarray(arrays['observation'])
    rest = {k: jnp.asarray(v) if hasattr(v, 'shape') else v
            for k, v in arrays.items() if k != 'observation'}

    # NOTE: batch/params must be ARGUMENTS, not closure constants — baked
    # constants blow the remote-compile payload limit (HTTP 413 on relay).
    fwd = jax.jit(lambda p, o, r: model.loss_fn(
        p, {**r, 'observation': o}, rng=key)[0])
    timed('loss_fn fwd', lambda o: fwd(params, o, rest), obs)

    grad = jax.jit(lambda p, o, r: jax.grad(
        lambda pp: model.loss_fn(pp, {**r, 'observation': o},
                                 rng=key)[0])(p))
    timed('loss_fn fwd+bwd', lambda o: grad(params, o, rest), obs)

    tx = Adam(gradient_clipping=10, lr=1e-3).make()
    opt_state = jax.jit(tx.init)(params)

    def update(o, r, p, s):
        g = jax.grad(lambda pp: model.loss_fn(
            pp, {**r, 'observation': o}, rng=key)[0])(p)
        u, s = tx.update(g, s, p)
        return jax.tree_util.tree_map(lambda a, b: a + b, p, u)

    upd = jax.jit(update)
    timed('full update', lambda o: upd(o, rest, params, opt_state), obs)


if __name__ == '__main__':
    main()
