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
    def timed(tag, jfn, *args, iters=3):
        out = jfn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for i in range(iters):
            a = [args[0] * (1 + 1e-6 * (i + 1))] + list(args[1:]) \
                if hasattr(args[0], 'shape') else list(args)
            out = jfn(*a)
            float(jnp.sum(
                jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        print(f'{tag}: {(time.perf_counter() - t0) / iters * 1000:.1f} ms')

    key = jax.random.PRNGKey(1)
    obs = jnp.asarray(arrays['observation'])

    fwd = jax.jit(lambda o: model.loss_fn(
        params, {**arrays, 'observation': o}, rng=key)[0])
    timed('loss_fn fwd', fwd, obs)

    grad = jax.jit(lambda o: jax.grad(
        lambda p: model.loss_fn(p, {**arrays, 'observation': o},
                                rng=key)[0])(params))
    timed('loss_fn fwd+bwd', grad, obs)

    tx = Adam(gradient_clipping=10, lr=1e-3).make()
    opt_state = jax.jit(tx.init)(params)

    def update(o, p, s):
        g = jax.grad(lambda pp: model.loss_fn(
            pp, {**arrays, 'observation': o}, rng=key)[0])(p)
        u, s = tx.update(g, s, p)
        return jax.tree_util.tree_map(lambda a, b: a + b, p, u)

    upd = jax.jit(update)
    timed('full update', upd, obs, params, opt_state)


if __name__ == '__main__':
    main()
