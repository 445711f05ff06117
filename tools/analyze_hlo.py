"""Lower the flagship train step and tally big data-movement ops.

No chip execution: jit.lower() traces to StableHLO locally.  Groups
transpose/reshape/convert/concatenate/pad ops by byte size to show where
the non-kernel step time (XLA 'glue') goes.

Usage: python tools/analyze_hlo.py [min_mb]
"""

import os
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault('TSSEP_LSTM_IMPL', 'pallas')
os.environ.setdefault('TSSEP_LSTM_DTYPE', 'bfloat16')
os.environ.setdefault('TSSEP_COMPUTE_DTYPE', 'bfloat16')
os.environ.setdefault('TSSEP_DFT_PRECISION', 'default')

import jax
import jax.numpy as jnp

DTYPE_BYTES = {'f32': 4, 'f64': 8, 'bf16': 2, 'f16': 2, 'c64': 8,
               'c128': 16, 'i32': 4, 'u32': 4, 'i8': 1, 'u8': 1,
               'i64': 8, 's32': 4, 's64': 8, 'pred': 1, 'i1': 1}


def tensor_bytes(ty):
    m = re.match(r'tensor<([0-9x]*)x?([a-z0-9]+)>', ty)
    if not m:
        return 0
    dims, dt = m.groups()
    n = 1
    for d in dims.split('x'):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def main():
    min_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 50.0
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import importlib
    bench = importlib.import_module('bench')

    model, params, opt_state, train_step, make_batch = bench.build(256)
    batch = jax.eval_shape(make_batch, jax.random.PRNGKey(0))
    batch = {k: jnp.zeros(v.shape, v.dtype) if hasattr(v, 'shape') else v
             for k, v in batch.items()}
    key = jax.random.PRNGKey(1)

    lowered = jax.jit(train_step).lower(params, opt_state, batch, key)
    text = lowered.as_text()

    # op name = first token after '=' on stablehlo lines
    per_op = defaultdict(lambda: [0, 0])
    big = []
    for line in text.splitlines():
        m = re.search(r'=\s+"?(stablehlo\.\w+|tpu_custom_call|func\.call)'
                      r'"?[^:]*:.*->\s*(tensor<[^>]+>)', line)
        if not m:
            m2 = re.search(r'=\s+"?(stablehlo\.\w+)"?\s*[^:]*:\s*'
                           r'\((tensor<[^>]+>)', line)
            if not m2:
                continue
            op, ty = m2.groups()
        else:
            op, ty = m.groups()
        b = tensor_bytes(ty)
        per_op[op][0] += 1
        per_op[op][1] += b
        if b >= min_mb * 1e6 and ('transpose' in op or 'reshape' in op
                                  or 'convert' in op or 'concatenate' in op
                                  or 'pad' in op or 'custom_call' in op
                                  or 'slice' in op):
            big.append((b, op, ty, line.strip()[:140]))

    print('=== total output bytes by op (top 25) ===')
    rows = sorted(per_op.items(), key=lambda kv: -kv[1][1])[:25]
    for op, (n, b) in rows:
        print(f'{op:35s} n={n:5d}  {b / 1e9:7.2f} GB')

    print(f'\n=== individual movement ops >= {min_mb} MB ===')
    for b, op, ty, line in sorted(big, reverse=True)[:40]:
        print(f'{b / 1e6:9.1f} MB  {op:28s} {ty}')


if __name__ == '__main__':
    main()
