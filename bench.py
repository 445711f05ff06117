"""Benchmark: flagship TS-SEP training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: audio-seconds processed per second per chip for the full training
step (STFT -> features -> 8-speaker BLSTM mask estimator (ts_vad stacking)
-> masking -> ISTFT -> LogMAE -> backward -> Adam update) on 5 s clips.

``vs_baseline``: the reference repo publishes no throughput numbers
(BASELINE.md); we report the ratio against the measured torch-CPU reference
-class throughput recorded in BASELINE_LOCAL.json when present, else 1.0.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

# Best verified configuration: Pallas fused LSTM with bf16 streaming
# (quality-neutral on the toy recipes; see tests + README).
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

    clip_seconds = 5
    batch = int(os.environ.get("BENCH_BATCH", "256"))

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
    tx = Adam(gradient_clipping=10, lr=1e-3).make()
    opt_state = jax.jit(tx.init)(params)

    ds = model.prepare_validate_dataset(prefetch=False, batch_size=4)
    ex = next(iter(ds))
    arrays = {k: v for k, v in ex.items()
              if hasattr(v, 'shape') or k == 'reference_channel'}
    # tile to the bench batch size
    reps = -(-batch // 4)
    for k, v in arrays.items():
        if hasattr(v, 'shape') and v.ndim >= 1:
            arrays[k] = jnp.concatenate([v] * reps, axis=0)[:batch]

    def train_step(params, opt_state, batch_, key):
        (loss, _aux), grads = jax.value_and_grad(
            model.loss_fn, has_aux=True)(params, batch_, key, True)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))

    # Warmup / compile.  NOTE: a host transfer (float()) is the only
    # reliable full sync on relay-style TPU runtimes where
    # block_until_ready can return before the computation retires.
    key = jax.random.PRNGKey(1)
    params, opt_state, loss = step(params, opt_state, arrays, key)
    float(loss)

    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        key = jax.random.fold_in(key, i)
        params, opt_state, loss = step(params, opt_state, arrays, key)
    float(loss)  # forces the whole dependent chain
    elapsed = time.perf_counter() - t0

    audio_seconds = n_steps * batch * clip_seconds
    value = audio_seconds / elapsed

    vs_baseline = 1.0
    baseline_file = Path(__file__).parent / 'BASELINE_LOCAL.json'
    if baseline_file.exists():
        try:
            ref = json.loads(baseline_file.read_text())
            ref_value = ref.get('train_audio_seconds_per_second')
            if ref_value:
                vs_baseline = value / ref_value
        except Exception:  # noqa: BLE001
            pass

    print(json.dumps({
        'metric': f'train audio-seconds/s/chip (flagship 8-spk TS-SEP, 5s clips, batch {batch})',
        'value': round(value, 2),
        'unit': 'audio-s/s/chip',
        'vs_baseline': round(vs_baseline, 3),
    }))


if __name__ == '__main__':
    main()
