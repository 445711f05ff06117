"""Benchmark: flagship TS-SEP training throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Metric: audio-seconds processed per second per chip for the full training
step (STFT -> features -> 8-speaker BLSTM mask estimator (ts_vad stacking)
-> masking -> ISTFT -> LogMAE -> backward -> Adam update) on 5 s clips.

Every timed step consumes a FRESH batch from the on-device meeting
simulator (``data.device_sim``) — the input pipeline is part of the
measurement, nothing is cached across steps, and the relay's
identical-execution dedup cannot flatter the numbers.  ``--tiled``
restores the old fixed-batch measurement for comparison.

Scaling mode (the 1-chip / N-chip table of the north star)::

    python bench.py --mesh data=N           # audio-s/s, /chip, efficiency
    python bench.py --mesh data=8 --dryrun-cpu   # harness check, no TPUs

``--mesh`` shards the batch over the 'data' axis of a device mesh and
reports total and per-chip throughput plus scaling efficiency vs a 1-chip
run measured in the same invocation.

``vs_baseline``: the reference repo publishes no throughput numbers
(BASELINE.md); we report the ratio against the measured torch-CPU reference
-class throughput recorded in BASELINE_LOCAL.json when present, else 1.0.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

# Best verified configuration: Pallas fused LSTM with bf16 streaming
# (quality-neutral on the toy recipes; see tests + README).
os.environ.setdefault('TSSEP_LSTM_IMPL', 'pallas')
os.environ.setdefault('TSSEP_LSTM_DTYPE', 'bfloat16')
os.environ.setdefault('TSSEP_PALLAS_BATCH_BLOCK', '256')
os.environ.setdefault('TSSEP_COMPUTE_DTYPE', 'bfloat16')
os.environ.setdefault('TSSEP_PALLAS_TIME_BLOCK', '4')
os.environ.setdefault('TSSEP_DFT_PRECISION', 'default')
# bf16 head/loss path: halves the (B,S,T,F) mask-path HBM traffic —
# chip-measured +11.2% (2457 -> 2733 audio-s/s); training-quality
# neutral in the 60-iteration two-stage A/B (losses track to ~4 decimal
# places both stages, TODO.md round 4).
os.environ.setdefault('TSSEP_HEAD_BF16', '1')

CLIP_SECONDS = 5


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('--batch', type=int,
                   default=int(os.environ.get('BENCH_BATCH', '256')),
                   help='global batch size')
    p.add_argument('--steps', type=int,
                   default=int(os.environ.get('BENCH_STEPS', '20')))
    p.add_argument('--mesh', default=None,
                   help="e.g. 'data=4': scaling mode over a device mesh")
    p.add_argument('--dryrun-cpu', action='store_true',
                   help='force N virtual CPU devices (harness validation '
                        'without TPU hardware)')
    p.add_argument('--tiled', action='store_true',
                   help='old fixed-batch measurement (one batch reused '
                        'every step) instead of fresh on-device batches')
    p.add_argument('--infer', action='store_true',
                   help='inference (serving forward) throughput instead '
                        'of the training step')
    p.add_argument('--stage-budget', action='store_true',
                   help='per-stage time attribution: measure a ladder of '
                        'truncated steps (loss attached at successively '
                        'later pipeline points; XLA dead-code-eliminates '
                        'everything downstream) and print the differences')
    return p.parse_args(argv)


def _parse_mesh(spec):
    axes = {}
    for part in spec.split(','):
        name, _, n = part.partition('=')
        axes[name.strip()] = int(n)
    assert 'data' in axes and set(axes) <= {'data'}, (
        f'bench --mesh supports data=N, got {spec!r}')
    return axes


def build(batch):
    """Model, params, optimizer, jitted step + on-device batch source."""
    import jax

    from tssep_tpu.data.device_sim import DeviceMeetingSimulator
    from tssep_tpu.tasks.model import Model
    from tssep_tpu.train.optimizer import Adam

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

    sim = DeviceMeetingSimulator(duration=CLIP_SECONDS)
    targets = set(model.loss.device_targets()) | {'Vad'}

    def make_batch(key):
        ex = sim.generate(key, batch)
        keep = {'observation', 'auxInput', 'reference_channel'} | targets
        return {k: v for k, v in ex.items() if k in keep}

    # TSSEP_BENCH_NO_AUX=1: differentiate the scalar loss WITHOUT the
    # per-example-loss aux output.  The R5J/R5S stage ladders (which use
    # exactly this form) measured the full step ~13% faster than the
    # default; this knob isolates whether the aux output is the cause.
    no_aux = os.environ.get('TSSEP_BENCH_NO_AUX', '0') != '0'

    def train_step(params, opt_state, batch_, key):
        if no_aux:
            def scalar_loss(p):
                out = model.forward(p, batch_, rng=key, training=True)
                loss, _ = model.review_loss(batch_, out)
                return loss
            loss, grads = jax.value_and_grad(scalar_loss)(params)
        else:
            (loss, _aux), grads = jax.value_and_grad(
                model.loss_fn, has_aux=True)(params, batch_, key, True)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return model, params, opt_state, train_step, make_batch


def measure(params, opt_state, step, gen, n_steps, *, place=None):
    """Timed loop; fresh batch per step; host transfer = the only true
    sync on relay-style TPU runtimes (block_until_ready can return
    early)."""
    import jax

    key = jax.random.PRNGKey(1)
    bkey = jax.random.PRNGKey(2)
    batch = gen(bkey)
    if place is not None:
        batch = place(batch)
    params, opt_state, loss = step(params, opt_state, batch, key)
    float(loss)  # compile + warmup sync

    t0 = time.perf_counter()
    for i in range(n_steps):
        bkey = jax.random.fold_in(bkey, i)
        batch = gen(bkey)
        if place is not None:
            batch = place(batch)
        key = jax.random.fold_in(key, i)
        params, opt_state, loss = step(params, opt_state, batch, key)
    float(loss)  # forces the whole dependent chain
    return time.perf_counter() - t0


#: Attribution ladder: each entry is a full train step (fwd+bwd+clip+Adam)
#: truncated at the named point; successive differences attribute wall time
#: to [input pipeline, STFT+features, pre_net, birnn0, birnn1, birnn2
#: (+stacking), final linear, head transpose, trials/revert/sigmoid,
#: masked synthesis, ISTFT+loss].
STAGES = ('gen', 'feat', 'pre_net', 'birnn0', 'birnn1', 'birnn2',
          'linear', 'head', 'mask', 'synthesis', 'full')


def run_stage_budget(args):
    import jax
    import jax.numpy as jnp

    model, params, opt_state, _, make_batch = build(args.batch)
    tx_holder = {}

    def staged_loss(params, ex, key, stage):
        if stage == 'gen':
            return jnp.sum(ex['observation'])
        ref = ex['reference_channel']
        obs_stft = model.fe.stft(ex['observation'])
        feats = model.fe.stft_to_feature(
            obs_stft[..., ref, :, :]).astype(jnp.float32)
        if stage == 'feat':
            return jnp.sum(feats)
        if stage in ('pre_net', 'birnn0', 'birnn1', 'birnn2', 'linear',
                     'head'):
            h = model.mask_estimator.apply(
                params['mask_estimator'], feats, ex['auxInput'],
                rng=key, training=True, stage=stage)
            return jnp.sum(h.astype(jnp.float32))
        out = model.forward(params, ex, rng=key, training=True)
        if stage == 'mask':
            return jnp.sum(out.mask.astype(jnp.float32))
        if stage == 'synthesis':
            est = getattr(out, '_re_im_estimate', None)
            if est is None:
                est = (out.stft_estimate.real, out.stft_estimate.imag)
            return sum(jnp.sum(e.astype(jnp.float32)) for e in est)
        loss, _ = model.review_loss(ex, out)
        return loss

    from tssep_tpu.train.optimizer import Adam
    rows = []
    prev = None
    for stage in STAGES:
        tx = tx_holder.setdefault('tx', Adam(gradient_clipping=10,
                                             lr=1e-3).make())

        def train_step(params, opt_state, batch_, key, _stage=stage):
            loss, grads = jax.value_and_grad(staged_loss)(
                params, batch_, key, _stage)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            params, updates)
            return params, opt_state, loss

        step = jax.jit(train_step)          # no donation: params reused
        gen = jax.jit(make_batch)
        elapsed = measure(params, opt_state, step, gen, args.steps)
        ms = elapsed / args.steps * 1e3
        rows.append({'stage': stage, 'step_ms': round(ms, 1),
                     'delta_ms': round(ms - prev, 1) if prev is not None
                     else None})
        prev = ms
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({'stage_budget': rows, 'batch': args.batch,
                      'steps': args.steps}))
    return rows


def run_single(args):
    import jax

    model, params, opt_state, train_step, make_batch = build(args.batch)
    # TSSEP_BENCH_DONATE=0: compile without buffer donation.  The R5J
    # stage-budget ladder (no donation, same computation) measured the
    # full step at 380 ms vs the donating default's ~431 ms — donation
    # changes the scheduler's aliasing constraints, another instance of
    # the round-4 'scheduler cliff'.
    donate = os.environ.get('TSSEP_BENCH_DONATE', '1') != '0'
    step = jax.jit(train_step, donate_argnums=(0, 1) if donate else ())

    if args.tiled:
        batch0 = jax.jit(make_batch)(jax.random.PRNGKey(2))
        gen = lambda key: batch0                          # noqa: E731
    else:
        gen = jax.jit(make_batch)

    elapsed = measure(params, opt_state, step, gen, args.steps)
    return args.steps * args.batch * CLIP_SECONDS / elapsed


def run_infer(args):
    """Inference throughput: the serving forward (features -> conditioned
    mask estimator -> masks + activity) on fresh on-device batches."""
    import jax
    import jax.numpy as jnp

    model, params, _, _, make_batch = build(args.batch)

    def infer_step(params, batch_, key):
        out = model.forward(params, batch_, rng=key, training=False)
        # serving outputs: masks + frame activity (sync on a small stat)
        act = out.vad_mask if out.vad_mask is not None else out.mask
        return jnp.sum(act.astype(jnp.float32))

    step = jax.jit(infer_step)
    gen = jax.jit(make_batch)
    key = jax.random.PRNGKey(1)
    bkey = jax.random.PRNGKey(2)
    s = step(params, gen(bkey), key)
    float(s)  # compile + warm sync
    t0 = time.perf_counter()
    for i in range(args.steps):
        bkey = jax.random.fold_in(bkey, i)
        # Chain each step on the previous step's scalar (folded into the
        # PRNG key): on a runtime that reorders or overlaps independent
        # executions, unchained steps would flatter the timing — this makes
        # step i+1 data-dependent on step i, like donation does for the
        # train loop, at the cost of one scalar add.
        key = jax.random.fold_in(key, s.astype(jnp.int32) & 0x7fffffff)
        s = step(params, gen(bkey), key)
    float(s)
    elapsed = time.perf_counter() - t0
    return args.steps * args.batch * CLIP_SECONDS / elapsed


def run_mesh(args, axes):
    """data-parallel scaling: 1-chip vs N-chip in one invocation."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n = axes['data']
    devices = jax.devices()
    assert len(devices) >= n, (
        f'--mesh data={n} but only {len(devices)} devices')

    model, params, opt_state, train_step, make_batch = build(args.batch)

    import numpy as np

    def throughput(num_devices, batch):
        mesh = Mesh(np.array(devices[:num_devices]), ('data',))

        # Each device generates its own batch shard (out_shardings on the
        # jitted generator): no host transfer, no resharding step.
        shapes = jax.eval_shape(make_batch, jax.random.PRNGKey(0))
        out_shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(
                mesh, P('data') if getattr(s, 'ndim', 0) >= 1 else P()),
            shapes)
        gen = jax.jit(make_batch, out_shardings=out_shardings)

        rep = NamedSharding(mesh, P())
        # copy: device_put may alias the originals, and the donated
        # buffers of the 1-chip run must survive for the N-chip run
        p = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep).copy(), params)
        o = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep).copy() if hasattr(x, 'copy')
            else x, opt_state)
        step = jax.jit(train_step, donate_argnums=(0, 1))

        elapsed = measure(p, o, step, gen, args.steps)
        return args.steps * batch * CLIP_SECONDS / elapsed

    one = throughput(1, args.batch)
    if n == 1:
        return one, one, 1.0
    total = throughput(n, args.batch)
    per_chip = total / n
    return total, per_chip, per_chip / one


def main(argv=None):
    args = parse_args(argv)

    if args.dryrun_cpu:
        n = _parse_mesh(args.mesh)['data'] if args.mesh else 8
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '')
            + f' --xla_force_host_platform_device_count={max(n, 2)}')
        os.environ['TSSEP_LSTM_IMPL'] = 'scan'
        import jax
        jax.config.update('jax_platforms', 'cpu')
        args.batch = min(args.batch, 8)
        args.steps = min(args.steps, 3)

    vs_baseline = 1.0
    baseline_file = Path(__file__).parent / 'BASELINE_LOCAL.json'

    if args.stage_budget:
        run_stage_budget(args)
        return

    if args.mesh:
        axes = _parse_mesh(args.mesh)
        total, per_chip, eff = run_mesh(args, axes)
        value = per_chip
        extra = {
            'mesh': axes,
            'total_audio_s_per_s': round(total, 2),
        }
        if args.dryrun_cpu:
            # Virtual CPU devices share one host: timing here validates the
            # sharded harness ONLY — an efficiency number would read as a
            # scaling result, so it is not emitted.
            extra['dryrun_cpu'] = True
            extra['note'] = ('correctness-only harness check on virtual CPU '
                             'devices; throughput/efficiency not meaningful')
        else:
            extra['scaling_efficiency'] = round(eff, 4)
        metric = (f'train audio-seconds/s/chip (flagship 8-spk TS-SEP, '
                  f'5s clips, global batch {args.batch}, '
                  f'data={axes["data"]})')
    elif args.infer:
        value = run_infer(args)
        extra = {}
        metric = (f'infer audio-seconds/s/chip (flagship 8-spk TS-SEP '
                  f'serving forward, 5s clips, batch {args.batch}, '
                  'fresh batches)')
    else:
        value = run_single(args)
        extra = {}
        metric = (f'train audio-seconds/s/chip (flagship 8-spk TS-SEP, '
                  f'5s clips, batch {args.batch}'
                  + (', tiled' if args.tiled else ', fresh batches') + ')')

    if baseline_file.exists():
        try:
            ref = json.loads(baseline_file.read_text())
            ref_value = ref.get('train_audio_seconds_per_second')
            if ref_value:
                vs_baseline = value / ref_value
        except Exception:  # noqa: BLE001
            pass

    print(json.dumps({
        'metric': metric,
        'value': round(value, 2),
        'unit': 'audio-s/s/chip',
        'vs_baseline': round(vs_baseline, 3),
        **extra,
    }))


if __name__ == '__main__':
    main()
