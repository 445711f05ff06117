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


def shape_report(model, params, example) -> str:
    """Per-stage activation-shape table for the mask estimator (the
    reference's ShapeTracker equivalent, built with jax.eval_shape — no
    compute)."""
    import jax
    import jax.numpy as jnp

    me = model.mask_estimator
    rows = []

    def add(name, shape_like):
        if hasattr(shape_like, 'shape'):
            rows.append((name, tuple(int(d) for d in shape_like.shape)))

    obs = example.get('observation')
    if obs is None:
        return 'shape report needs an example with observation'
    obs = jnp.asarray(obs)
    if obs.ndim == 2:
        obs = obs[None]
    add('observation', obs)
    Obs = jax.eval_shape(model.fe.stft, obs)
    add('Observation (stft)', Obs)
    feat = jax.eval_shape(
        lambda o: model.fe.stft_to_feature(o[..., 0, :, :]), Obs)
    add('Input (features)', feat)

    f32 = jax.ShapeDtypeStruct(feat.shape, jnp.float32)
    if me.pre_net is not None:
        pre = jax.eval_shape(
            lambda p, x: me.pre_net.apply(p, x), params['mask_estimator']['pre_net'], f32)
        add('pre_net', pre)

    aux = example.get('auxInput')
    if aux is not None:
        aux = jnp.asarray(aux)
        if aux.ndim == 2:
            aux = aux[None]
        add('auxInput', aux)
        out = jax.eval_shape(
            lambda p, x, a: me.apply(p, x, a),
            params['mask_estimator'], f32,
            jax.ShapeDtypeStruct(aux.shape, jnp.float32))
        add('mask', out.mask)
        if out.logit is not None:
            add('logit', out.logit)

    width = max(len(n) for n, _ in rows)
    return '\n'.join(f'{n:<{width}}  {s}' for n, s in rows)


def layer_time_report(model, params, example, iters=2) -> str:
    """Per-stage on-device timing table (the reference TimeTracker
    equivalent, ``net.py:453-483``).  Each stage is jitted and timed
    separately on its real intermediate inputs — stage boundaries mirror
    ``MaskEstimator.apply`` (no permutation trials / dropout, so the sum
    approximates, not equals, the fused step)."""
    import time

    import jax.numpy as jnp

    me = model.mask_estimator
    mp = params['mask_estimator']
    rows = []

    def timed(name, fn, *args):
        jfn = jax.jit(fn)
        out = jfn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(jnp.abs(leaf).astype(jnp.float32)))  # compile+sync
        t0 = time.perf_counter()
        for i in range(iters):
            # vary the input: relay runtimes dedupe identical executions
            a0 = args[0] * (1 + 1e-6 * (i + 1)) \
                if hasattr(args[0], 'shape') else args[0]
            out = jfn(a0, *args[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(jnp.abs(leaf).astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters * 1000
        rows.append((name, tuple(int(d) for d in leaf.shape), dt))
        return out

    obs = example.get('observation')
    if obs is None:
        return 'layer time report needs an example with observation'
    obs = jnp.asarray(obs)
    if obs.ndim == 2:
        obs = obs[None]
    Obs = timed('fe.stft', model.fe.stft, obs)
    xs = timed('fe.stft_to_feature',
               lambda o: model.fe.stft_to_feature(
                   o[..., 0, :, :]).astype(jnp.float32), Obs)

    aux = jnp.asarray(example['auxInput']).astype(jnp.float32)
    if aux.ndim == 2:
        aux = aux[None]
    if me.aux_net is not None:
        aux = timed('aux_net',
                    lambda a: me.aux_net.apply(params['mask_estimator'][
                        'aux_net'], a), aux)
    if me.input_normalizer is not None:
        xs = timed('input_normalizer', me.input_normalizer, xs)
    if me.pre_net is not None:
        xs = timed('pre_net',
                   lambda x: me.pre_net.apply(mp['pre_net'], x), xs)

    from tssep_tpu.nn.estimator import COMPUTE_DTYPE
    if COMPUTE_DTYPE is not None:
        xs = xs.astype(COMPUTE_DTYPE)
        aux = aux.astype(COMPUTE_DTYPE)

    if me.combination == 'mul':
        h = timed('conditioning (mul)',
                  lambda x, a: x[:, None, :, :] * a[:, :, None, :], xs, aux)
    else:
        h = timed('conditioning (cat)',
                  lambda x, a: jnp.concatenate([
                      jnp.broadcast_to(
                          x[:, None], (x.shape[0], a.shape[1]) + x.shape[1:]),
                      jnp.broadcast_to(
                          a[:, :, None, :],
                          (x.shape[0], a.shape[1], x.shape[1], a.shape[-1])),
                  ], axis=-1), xs, aux)

    for l in range(me.layers):
        birnn = me.birnns[l]
        if l == me.layers - 1 and me.ts_vad:
            h = jnp.swapaxes(
                jnp.swapaxes(h, 1, 2).reshape(
                    h.shape[0], h.shape[2], 1, -1), 1, 2)
        lp = mp['post_net'][f'birnn{l}']
        h = timed(f'post_net.birnn{l}',
                  lambda x, _lp=lp, _b=birnn: _b.apply(_lp, x), h)
        if l < me.layers - 1:
            h = jnp.tanh(h)
    lin = mp['post_net'][f'linear{me.layers - 1}']
    timed('head (linear+sigmoid)',
          lambda x: jax.nn.sigmoid(
              x @ lin['weight'].T.astype(x.dtype)
              + lin['bias'].astype(x.dtype)), h)

    width = max(len(n) for n, _, _ in rows)
    total = sum(dt for _, _, dt in rows)
    lines = [f'{n:<{width}}  {str(s):<28} {dt:9.2f} ms'
             for n, s, dt in rows]
    lines.append('-' * (width + 42))
    lines.append(f'{"total (unfused sum)":<{width}}  {"":<28} '
                 f'{total:9.2f} ms')
    return '\n'.join(lines)
