"""Model instrumentation: per-layer shape/parameter report + jit cost
analysis.

TPU-side equivalent of the reference's forward-hook trackers
(``padertorch.contrib.cb.track`` used at ``experiment.py:234-257``):
parameter tables come from the param pytree, per-op cost from XLA's
``cost_analysis`` on the compiled step — written to ``log/trackers.txt``.
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = ['param_table', 'model_report', 'cost_analysis_report']


def param_table(params) -> str:
    from tssep_tpu.train.checkpoint import params_to_named
    named = params_to_named(params)
    lines = []
    total = 0
    width = max((len(k) for k in named), default=20)
    for name, arr in named.items():
        n = int(np.prod(arr.shape))
        total += n
        lines.append(f'{name:<{width}}  {str(tuple(arr.shape)):<20} {n:>12,}')
    lines.append('-' * (width + 34))
    lines.append(f'{"total":<{width}}  {"":<20} {total:>12,}')
    return '\n'.join(lines)


def model_report(model, params) -> str:
    parts = [
        f'Model: {type(model).__name__}',
        f'  feature extractor: {model.fe!r}',
        f'  enhancer: {model.enhancer.name}',
        f'  loss: {model.loss.name}',
        '',
        'Parameters:',
        param_table(params),
    ]
    return '\n'.join(parts)


def cost_analysis_report(jitted_fn, *example_args) -> str:
    """FLOP/byte estimates from the compiled executable (XLA cost model)."""
    try:
        lowered = jitted_fn.lower(*example_args)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        keys = ['flops', 'bytes accessed', 'transcendentals',
                'utilization operand 0 {}', 'optimal_seconds']
        lines = ['XLA cost analysis:']
        for k, v in sorted(cost.items()):
            if any(k.startswith(p.split()[0]) for p in keys) or k in keys:
                lines.append(f'  {k}: {v:,.0f}' if isinstance(v, float)
                             else f'  {k}: {v}')
        mem = compiled.memory_analysis()
        if mem is not None:
            for attr in ['temp_size_in_bytes', 'argument_size_in_bytes',
                         'output_size_in_bytes', 'generated_code_size_in_bytes']:
                v = getattr(mem, attr, None)
                if v is not None:
                    lines.append(f'  {attr}: {v:,}')
        return '\n'.join(lines)
    except Exception as e:  # noqa: BLE001
        return f'cost_analysis unavailable: {type(e).__name__}: {e}'
