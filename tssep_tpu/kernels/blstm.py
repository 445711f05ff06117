"""Pallas fused LSTM kernels (TPU).

The scan-based recurrence (``tssep_tpu/nn/rnnp.py``) launches one XLA fusion
per unrolled block and round-trips carries through HBM at loop boundaries.
These kernels keep the hidden/cell state *and* the recurrent weights
resident in VMEM for the whole sequence, fusing the per-step hidden matmul
(MXU) with the gate nonlinearities (VPU).  Four escalating variants:

1. ``lstm_fused`` / ``blstm_apply_fused``: single-direction cell over a
   (batch-block, time-block) grid; carries in VMEM scratch; the input
   projections ``xg = x @ W_ih^T + b`` stay outside (one large MXU matmul);
   backward is a reverse-walking kernel recomputing gates from the saved
   state sequences and accumulating ``dW_hh`` in VMEM (``jax.custom_vjp``).
2. ``blstm_apply_fused_bidi`` (``TSSEP_PALLAS_BIDI``, default): BOTH
   directions interleaved in one kernel — two independent dependency
   chains per step halve the sequential pallas calls and hide each
   other's MXU/VPU latency (chip-verified, +3% end-to-end).
3. ``blstm_layer_fused`` (``TSSEP_PALLAS_LAYER_VJP``): layer-level custom
   VJP whose backward recomputes only the input projections instead of
   remat's full forward recurrence re-run.
4. ``blstm_layer_fullfused`` (``TSSEP_PALLAS_FULLFUSE``): the input
   projections run INSIDE the kernel — no xg tensors in HBM at all;
   streams the raw x blocks (~5x less per grid step), so larger batch
   blocks fit VMEM; backward accumulates ``dW_ih``/bias grads in scratch.

Reversed directions are realized by time-flipping inputs/outputs outside
the kernel (cheap XLA ops, differentiable), so only forward-order kernels
exist.  All variants are validated against the scan path by the
interpreter tests (``tests/test_kernels.py``; ``TSSEP_PALLAS_INTERPRET``).

Gate order i, f, g, o (torch layout), matching the rest of the framework.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['lstm_fused', 'blstm_apply_fused', 'blstm_apply_fused_bidi',
           'blstm_layer_fused', 'blstm_layer_fullfused',
           'blstm_layer_fullfused_spill', 'blstm_layer_fullfused_cond']


# ---------------------------------------------------------------------------
# Kernels (forward time order only)
# ---------------------------------------------------------------------------

def _fwd_kernel(xg_ref, whh_ref, hs_ref, cs_ref, h_scr, c_scr, *, hidden,
                time_block):
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    def step(k, _):
        h = h_scr[:]
        c = c_scr[:]
        gates = xg_ref[k].astype(jnp.float32) + jnp.dot(
            h.astype(whh_ref.dtype), whh_ref[:],
            preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        h_scr[:] = h
        c_scr[:] = c
        hs_ref[k] = h.astype(hs_ref.dtype)
        cs_ref[k] = c.astype(cs_ref.dtype)
        return 0

    jax.lax.fori_loop(0, time_block, step, 0)


def _bwd_kernel(xg_ref, whh_ref, hprev_ref, cprev_ref, c_ref, dhs_ref,
                dxg_ref, dwhh_ref, dh_scr, dc_scr, dw_scr, *, hidden,
                time_block):
    tb = pl.program_id(1)            # walks time blocks last-to-first
    bblk = pl.program_id(0)
    n_tb = pl.num_programs(1)

    @pl.when(tb == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dw_scr[:] = jnp.zeros_like(dw_scr)

    def step(j, _):
        k = time_block - 1 - j
        h_prev = hprev_ref[k]
        c_prev = cprev_ref[k].astype(jnp.float32)
        c_t = c_ref[k].astype(jnp.float32)

        gates = xg_ref[k].astype(jnp.float32) + jnp.dot(
            h_prev, whh_ref[:], preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])

        dh = dh_scr[:] + dhs_ref[k]
        tanh_c = jnp.tanh(c_t)
        do = dh * tanh_c
        dc = dc_scr[:] + dh * o * (1 - tanh_c * tanh_c)
        di = dc * g
        df = dc * c_prev
        dg = dc * i
        dgates = jnp.concatenate([
            di * i * (1 - i),
            df * f * (1 - f),
            dg * (1 - g * g),
            do * o * (1 - o),
        ], axis=1)

        dgm = _mm_cast(dgates, whh_ref)
        dxg_ref[k] = dgates.astype(dxg_ref.dtype)
        dw_scr[:] += jnp.dot(h_prev.T.astype(dgm.dtype), dgm,
                             preferred_element_type=jnp.float32)
        dh_scr[:] = jnp.dot(dgm, whh_ref[:].T.astype(dgm.dtype),
                            preferred_element_type=jnp.float32)
        dc_scr[:] = dc * f
        return 0

    jax.lax.fori_loop(0, time_block, step, 0)

    # Flush the weight-grad accumulator on the last visited block of each
    # batch block (the output block index is constant; later batch blocks
    # add on top starting from the first one's result).
    @pl.when(tb == n_tb - 1)
    def _():
        @pl.when(bblk == 0)
        def _():
            dwhh_ref[:] = dw_scr[:]

        @pl.when(bblk > 0)
        def _():
            dwhh_ref[:] += dw_scr[:]

        dw_scr[:] = jnp.zeros_like(dw_scr)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

#: Storage dtype for the streamed tensors (xg, hs, cs, dxg) — bf16 halves
#: the HBM traffic of the recurrence and runs the MXU at its native rate;
#: carries and all accumulation stay f32.
import os as _os
STORAGE_DTYPE = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}[
    _os.environ.get('TSSEP_LSTM_DTYPE', 'float32')]

#: Mosaic's default scoped-VMEM budget (16 MiB) is far below the chip's
#: physical VMEM; larger (batch x time) blocks need the real budget to
#: amortize per-grid-step overhead over bigger MXU ops.
VMEM_LIMIT = int(__import__("os").environ.get(
    "TSSEP_PALLAS_VMEM_LIMIT", str(100 * 1024 * 1024)))
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)

#: Interpret mode: run the kernels through the Pallas interpreter (works on
#: CPU) — for testing kernel logic without TPU hardware.
INTERPRET = _os.environ.get('TSSEP_PALLAS_INTERPRET', '0') != '0'

#: Run the backward-pass matmuls on storage-dtype (bf16) operands with
#: f32 accumulation instead of full f32.  Chip-measured NEUTRAL on v5e
#: (114.5 vs 114.8 ms per folded layer fwd+bwd — Mosaic's f32 matmul
#: path is not the bottleneck there), so the numerically-tighter f32
#: path stays the default; the knob exists for TPU generations where
#: f32 MXU throughput is the constraint.
BWD_MM_STORAGE = _os.environ.get('TSSEP_PALLAS_BWD_BF16', '0') != '0'


def _mm_cast(dgates, ref):
    """Backward-matmul operand dtype: storage dtype unless BWD_F32."""
    if BWD_MM_STORAGE:
        return dgates.astype(ref.dtype)
    return dgates

#: Per-grid-step batch block: bounds the kernel's VMEM working set (the
#: batch axis is embarrassingly parallel; t stays the inner, sequential
#: grid axis so the recurrence carry in scratch is per batch block).
BATCH_BLOCK = int(__import__("os").environ.get("TSSEP_PALLAS_BATCH_BLOCK", "256"))


def _pad_batch(x, multiple=8):
    n = x.shape[1]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    return jnp.pad(x, [(0, 0), (0, pad), (0, 0)]), n


def _batch_block(b):
    return min(b, BATCH_BLOCK)


#: Time steps per grid program: amortizes per-grid-step overhead; the inner
#: fori_loop runs on VMEM-resident data.
TIME_BLOCK = int(__import__("os").environ.get("TSSEP_PALLAS_TIME_BLOCK", "4"))


def _pad_time_multiple(x, k):
    t = x.shape[0]
    pad = (-t) % k
    if pad == 0:
        return x, t
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)), t


def _core_fwd_impl(xg, w_hh_t):
    seq_len, b, gh = xg.shape
    sdt = xg.dtype
    hidden = w_hh_t.shape[0]
    bb = _batch_block(b)
    nb = b // bb
    k = TIME_BLOCK
    assert seq_len % k == 0, (seq_len, k)
    ntb = seq_len // k
    hs, cs = pl.pallas_call(
        functools.partial(_fwd_kernel, hidden=hidden, time_block=k),
        grid=(nb, ntb),
        in_specs=[
            pl.BlockSpec((k, bb, gh), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, bb, hidden), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bb, hidden), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, b, hidden), sdt),
            jax.ShapeDtypeStruct((seq_len, b, hidden), sdt),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(xg, w_hh_t)
    return hs, cs


@jax.custom_vjp
def _lstm_core(xg, w_hh_t):
    """xg: (T, B, 4H) -> hs: (T, B, H), forward time order."""
    hs, _ = _core_fwd_impl(xg, w_hh_t)
    return hs


def _lstm_core_fwd(xg, w_hh_t):
    hs, cs = _core_fwd_impl(xg, w_hh_t)
    return hs, (xg, w_hh_t, hs, cs)


def _lstm_core_bwd(residuals, dhs):
    xg, w_hh_t, hs, cs = residuals
    seq_len, b, hidden = hs.shape
    gh = xg.shape[-1]

    sdt = xg.dtype
    zeros = jnp.zeros((1, b, hidden), hs.dtype)
    hs_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)   # index t -> h_{t-1}
    cs_prev = jnp.concatenate([zeros, cs[:-1]], axis=0)   # index t -> c_{t-1}
    dhs = dhs.astype(jnp.float32)

    bb = _batch_block(b)
    nb = b // bb
    k = TIME_BLOCK
    assert seq_len % k == 0, (seq_len, k)
    ntb = seq_len // k
    rev = lambda i, t: ((ntb - 1 - t), i, 0)  # noqa: E731
    dxg, dwhh = pl.pallas_call(
        functools.partial(_bwd_kernel, hidden=hidden, time_block=k),
        grid=(nb, ntb),
        in_specs=[
            pl.BlockSpec((k, bb, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bb, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bb, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bb, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bb, hidden), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, bb, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, b, gh), sdt),
            jax.ShapeDtypeStruct((hidden, gh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((hidden, gh), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(xg, w_hh_t, hs_prev, cs_prev, cs, dhs)
    return dxg.astype(jnp.float32), dwhh


_lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


def lstm_fused(xg, w_hh_t, reverse=False):
    """Fused LSTM over time.

    xg: (T, B, 4H) input projections (+ biases); w_hh_t: (H, 4H).
    Returns hs: (T, B, H).
    """
    xg = xg.astype(STORAGE_DTYPE)
    multiple = BATCH_BLOCK if xg.shape[1] >= BATCH_BLOCK else 8
    xg, real_b = _pad_batch(xg, multiple)
    if reverse:
        xg = jnp.flip(xg, axis=0)
    xg, real_t = _pad_time_multiple(xg, TIME_BLOCK)
    hs = _lstm_core(xg, w_hh_t.astype(STORAGE_DTYPE))
    hs = hs[:real_t]
    if reverse:
        hs = jnp.flip(hs, axis=0)
    return hs[:, :real_b].astype(jnp.float32)


def blstm_apply_fused(params, x, *, hidden_size, bidirectional=True):
    """Drop-in BLSTM layer using the fused kernel (same contract as
    ``tssep_tpu.nn.rnnp.blstm_apply``).  Bidirectional layers default to
    the direction-interleaved kernel (below) — two independent dependency
    chains per step halve the sequential pallas calls and hide each
    other's MXU/VPU latency."""
    if bidirectional and BIDI:
        return blstm_apply_fused_bidi(params, x, hidden_size=hidden_size)

    def direction(suffix, reverse):
        w_ih = params['weight_ih_l0' + suffix].astype(x.dtype)
        w_hh = params['weight_hh_l0' + suffix]
        bias = (params['bias_ih_l0' + suffix]
                + params['bias_hh_l0' + suffix]).astype(x.dtype)
        xg = x @ w_ih.T + bias
        xg = jnp.swapaxes(xg, 0, 1)
        ys = lstm_fused(xg, w_hh.T, reverse)
        return jnp.swapaxes(ys, 0, 1).astype(x.dtype)

    out = direction('', False)
    if bidirectional:
        out = jnp.concatenate([out, direction('_reverse', True)], axis=-1)
    return out


# ---------------------------------------------------------------------------
# Direction-interleaved bidirectional kernels
# ---------------------------------------------------------------------------
# The two directions of a BLSTM are independent recurrences; running them in
# ONE kernel halves the number of sequential pallas calls and gives the
# scheduler two independent dependency chains per step — the reverse
# direction's hidden matmul issues while the forward direction's gate
# nonlinearities occupy the VPU (and vice versa), hiding the serial latency
# that dominates the recurrence (TODO perf item #1).  The reverse input is
# pre-flipped outside, so both directions walk the grid forward.

def _bi_fwd_kernel(xgf_ref, xgr_ref, wf_ref, wr_ref,
                   hsf_ref, hsr_ref, csf_ref, csr_ref,
                   hf_scr, cf_scr, hr_scr, cr_scr, *, hidden, time_block):
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        cf_scr[:] = jnp.zeros_like(cf_scr)
        hr_scr[:] = jnp.zeros_like(hr_scr)
        cr_scr[:] = jnp.zeros_like(cr_scr)

    def step(k, _):
        hf = hf_scr[:]
        hr = hr_scr[:]
        # Two independent MXU chains — issue both dots back to back
        gf = xgf_ref[k].astype(jnp.float32) + jnp.dot(
            hf.astype(wf_ref.dtype), wf_ref[:],
            preferred_element_type=jnp.float32)
        gr = xgr_ref[k].astype(jnp.float32) + jnp.dot(
            hr.astype(wr_ref.dtype), wr_ref[:],
            preferred_element_type=jnp.float32)

        i_f = jax.nn.sigmoid(gf[:, :hidden])
        f_f = jax.nn.sigmoid(gf[:, hidden:2 * hidden])
        g_f = jnp.tanh(gf[:, 2 * hidden:3 * hidden])
        o_f = jax.nn.sigmoid(gf[:, 3 * hidden:])
        cf = f_f * cf_scr[:] + i_f * g_f
        hf = o_f * jnp.tanh(cf)

        i_r = jax.nn.sigmoid(gr[:, :hidden])
        f_r = jax.nn.sigmoid(gr[:, hidden:2 * hidden])
        g_r = jnp.tanh(gr[:, 2 * hidden:3 * hidden])
        o_r = jax.nn.sigmoid(gr[:, 3 * hidden:])
        cr = f_r * cr_scr[:] + i_r * g_r
        hr = o_r * jnp.tanh(cr)

        hf_scr[:] = hf
        cf_scr[:] = cf
        hr_scr[:] = hr
        cr_scr[:] = cr
        hsf_ref[k] = hf.astype(hsf_ref.dtype)
        csf_ref[k] = cf.astype(csf_ref.dtype)
        hsr_ref[k] = hr.astype(hsr_ref.dtype)
        csr_ref[k] = cr.astype(csr_ref.dtype)
        return 0

    jax.lax.fori_loop(0, time_block, step, 0)


def _bi_bwd_kernel(xgf_ref, xgr_ref, wf_ref, wr_ref,
                   hpf_ref, cpf_ref, cf_ref, dhsf_ref,
                   hpr_ref, cpr_ref, cr_ref, dhsr_ref,
                   dxgf_ref, dxgr_ref, dwf_ref, dwr_ref,
                   dhf_scr, dcf_scr, dwf_scr, dhr_scr, dcr_scr, dwr_scr,
                   *, hidden, time_block):
    tb = pl.program_id(1)            # walks time blocks last-to-first
    bblk = pl.program_id(0)
    n_tb = pl.num_programs(1)

    @pl.when(tb == 0)
    def _():
        dhf_scr[:] = jnp.zeros_like(dhf_scr)
        dcf_scr[:] = jnp.zeros_like(dcf_scr)
        dwf_scr[:] = jnp.zeros_like(dwf_scr)
        dhr_scr[:] = jnp.zeros_like(dhr_scr)
        dcr_scr[:] = jnp.zeros_like(dcr_scr)
        dwr_scr[:] = jnp.zeros_like(dwr_scr)

    def one_direction(k, xg_ref, w_ref, hp_ref, cp_ref, c_ref, dhs_ref,
                      dxg_ref, dh_scr, dc_scr, dw_scr):
        h_prev = hp_ref[k]
        c_prev = cp_ref[k].astype(jnp.float32)
        c_t = c_ref[k].astype(jnp.float32)

        gates = xg_ref[k].astype(jnp.float32) + jnp.dot(
            h_prev, w_ref[:], preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])

        dh = dh_scr[:] + dhs_ref[k]
        tanh_c = jnp.tanh(c_t)
        do = dh * tanh_c
        dc = dc_scr[:] + dh * o * (1 - tanh_c * tanh_c)
        di = dc * g
        df = dc * c_prev
        dg = dc * i
        dgates = jnp.concatenate([
            di * i * (1 - i),
            df * f * (1 - f),
            dg * (1 - g * g),
            do * o * (1 - o),
        ], axis=1)

        dgm = _mm_cast(dgates, w_ref)
        dxg_ref[k] = dgates.astype(dxg_ref.dtype)
        dw_scr[:] += jnp.dot(h_prev.T.astype(dgm.dtype), dgm,
                             preferred_element_type=jnp.float32)
        dh_scr[:] = jnp.dot(dgm, w_ref[:].T.astype(dgm.dtype),
                            preferred_element_type=jnp.float32)
        dc_scr[:] = dc * f

    def step(j, _):
        k = time_block - 1 - j
        one_direction(k, xgf_ref, wf_ref, hpf_ref, cpf_ref, cf_ref,
                      dhsf_ref, dxgf_ref, dhf_scr, dcf_scr, dwf_scr)
        one_direction(k, xgr_ref, wr_ref, hpr_ref, cpr_ref, cr_ref,
                      dhsr_ref, dxgr_ref, dhr_scr, dcr_scr, dwr_scr)
        return 0

    jax.lax.fori_loop(0, time_block, step, 0)

    @pl.when(tb == n_tb - 1)
    def _():
        @pl.when(bblk == 0)
        def _():
            dwf_ref[:] = dwf_scr[:]
            dwr_ref[:] = dwr_scr[:]

        @pl.when(bblk > 0)
        def _():
            dwf_ref[:] += dwf_scr[:]
            dwr_ref[:] += dwr_scr[:]

        dwf_scr[:] = jnp.zeros_like(dwf_scr)
        dwr_scr[:] = jnp.zeros_like(dwr_scr)


#: Batch block for the interleaved kernel (its VMEM working set is ~2x the
#: unidirectional kernel's at equal bb).
BIDI_BATCH_BLOCK = int(__import__("os").environ.get(
    "TSSEP_PALLAS_BIDI_BATCH_BLOCK", str(BATCH_BLOCK)))


def _bi_specs(k, bb, gh, hidden):
    xg = pl.BlockSpec((k, bb, gh), lambda i, t: (t, i, 0),
                      memory_space=pltpu.VMEM)
    w = pl.BlockSpec((hidden, gh), lambda i, t: (0, 0),
                     memory_space=pltpu.VMEM)
    h = pl.BlockSpec((k, bb, hidden), lambda i, t: (t, i, 0),
                     memory_space=pltpu.VMEM)
    return xg, w, h


def _bi_core_fwd_impl(xgf, xgr, wf_t, wr_t):
    seq_len, b, gh = xgf.shape
    sdt = xgf.dtype
    hidden = wf_t.shape[0]
    bb = min(b, BIDI_BATCH_BLOCK)
    nb = b // bb
    k = TIME_BLOCK
    assert seq_len % k == 0, (seq_len, k)
    ntb = seq_len // k
    xg_s, w_s, h_s = _bi_specs(k, bb, gh, hidden)
    out = pl.pallas_call(
        functools.partial(_bi_fwd_kernel, hidden=hidden, time_block=k),
        grid=(nb, ntb),
        in_specs=[xg_s, xg_s, w_s, w_s],
        out_specs=[h_s, h_s, h_s, h_s],
        out_shape=[jax.ShapeDtypeStruct((seq_len, b, hidden), sdt)] * 4,
        scratch_shapes=[pltpu.VMEM((bb, hidden), jnp.float32)] * 4,
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(xgf, xgr, wf_t, wr_t)
    return out  # hsf, hsr, csf, csr


@jax.custom_vjp
def _bi_core(xgf, xgr, wf_t, wr_t):
    """Interleaved BLSTM: both inputs in walked (forward) time order."""
    hsf, hsr, _, _ = _bi_core_fwd_impl(xgf, xgr, wf_t, wr_t)
    return hsf, hsr


def _bi_core_fwd(xgf, xgr, wf_t, wr_t):
    hsf, hsr, csf, csr = _bi_core_fwd_impl(xgf, xgr, wf_t, wr_t)
    return (hsf, hsr), (xgf, xgr, wf_t, wr_t, hsf, hsr, csf, csr)


def _bi_core_bwd(residuals, cotangents):
    xgf, xgr, wf_t, wr_t, hsf, hsr, csf, csr = residuals
    dhsf, dhsr = cotangents
    seq_len, b, hidden = hsf.shape
    gh = xgf.shape[-1]
    sdt = xgf.dtype

    def prevs(hs, cs):
        zeros = jnp.zeros((1, b, hidden), hs.dtype)
        return (jnp.concatenate([zeros, hs[:-1]], axis=0),
                jnp.concatenate([zeros, cs[:-1]], axis=0))

    hpf, cpf = prevs(hsf, csf)
    hpr, cpr = prevs(hsr, csr)
    dhsf = dhsf.astype(jnp.float32)
    dhsr = dhsr.astype(jnp.float32)

    bb = min(b, BIDI_BATCH_BLOCK)
    nb = b // bb
    k = TIME_BLOCK
    ntb = seq_len // k
    rev = lambda i, t: ((ntb - 1 - t), i, 0)  # noqa: E731
    xg_s = pl.BlockSpec((k, bb, gh), rev, memory_space=pltpu.VMEM)
    w_s = pl.BlockSpec((hidden, gh), lambda i, t: (0, 0),
                       memory_space=pltpu.VMEM)
    h_s = pl.BlockSpec((k, bb, hidden), rev, memory_space=pltpu.VMEM)
    dxgf, dxgr, dwf, dwr = pl.pallas_call(
        functools.partial(_bi_bwd_kernel, hidden=hidden, time_block=k),
        grid=(nb, ntb),
        in_specs=[xg_s, xg_s, w_s, w_s,
                  h_s, h_s, h_s, h_s,
                  h_s, h_s, h_s, h_s],
        out_specs=[xg_s, xg_s, w_s, w_s],
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, b, gh), sdt),
            jax.ShapeDtypeStruct((seq_len, b, gh), sdt),
            jax.ShapeDtypeStruct((hidden, gh), jnp.float32),
            jax.ShapeDtypeStruct((hidden, gh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((hidden, gh), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((hidden, gh), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(xgf, xgr, wf_t, wr_t, hpf, cpf, csf, dhsf, hpr, cpr, csr, dhsr)
    return (dxgf.astype(jnp.float32), dxgr.astype(jnp.float32), dwf, dwr)


_bi_core.defvjp(_bi_core_fwd, _bi_core_bwd)


#: Use the interleaved kernel for bidirectional layers ('1' default).
BIDI = __import__("os").environ.get("TSSEP_PALLAS_BIDI", "1") != "0"


def blstm_apply_fused_bidi(params, x, *, hidden_size):
    """Bidirectional layer through the direction-interleaved kernel."""
    def xg_of(suffix):
        w_ih = params['weight_ih_l0' + suffix].astype(x.dtype)
        bias = (params['bias_ih_l0' + suffix]
                + params['bias_hh_l0' + suffix]).astype(x.dtype)
        xg = x @ w_ih.T + bias
        return jnp.swapaxes(xg, 0, 1).astype(STORAGE_DTYPE)  # (T, B, 4H)

    xgf = xg_of('')
    xgr = jnp.flip(xg_of('_reverse'), axis=0)
    multiple = (BIDI_BATCH_BLOCK if xgf.shape[1] >= BIDI_BATCH_BLOCK
                else 8)
    xgf, real_b = _pad_batch(xgf, multiple)
    xgr, _ = _pad_batch(xgr, multiple)
    xgf, real_t = _pad_time_multiple(xgf, TIME_BLOCK)
    xgr, _ = _pad_time_multiple(xgr, TIME_BLOCK)
    hsf, hsr = _bi_core(xgf, xgr,
                        params['weight_hh_l0'].T.astype(STORAGE_DTYPE),
                        params['weight_hh_l0_reverse'].T.astype(
                            STORAGE_DTYPE))
    hsf = hsf[:real_t, :real_b]
    hsr = jnp.flip(hsr[:real_t], axis=0)[:, :real_b]
    out = jnp.concatenate([hsf, hsr], axis=-1)
    return jnp.swapaxes(out, 0, 1).astype(x.dtype)


# ---------------------------------------------------------------------------
# Layer-level custom VJP: recompute input projections instead of remat
# ---------------------------------------------------------------------------
# With ``jax.checkpoint`` around the layer (the scan path's memory strategy)
# the backward pass re-runs the WHOLE forward recurrence.  The kernel's
# backward only needs (xg, hs, cs); xg is a cheap parallel matmul away from
# the layer input x.  Saving (x, hs, cs) and recomputing xg in backward
# gives no-remat speed at near-remat memory:
#   residuals/layer: x (B,T,I) + 4x(T,B,H) states
#   vs remat:        x only, but backward re-runs the serial recurrence
#   vs no remat:     adds 2x xg (T,B,4H) — the dominant term.

def _bidi_prep(x, params):
    def xg_of(suffix):
        w_ih = params['weight_ih_l0' + suffix].astype(x.dtype)
        bias = (params['bias_ih_l0' + suffix]
                + params['bias_hh_l0' + suffix]).astype(x.dtype)
        xg = x @ w_ih.T + bias
        return jnp.swapaxes(xg, 0, 1).astype(STORAGE_DTYPE)  # (T, B, 4H)

    xgf = xg_of('')
    xgr = jnp.flip(xg_of('_reverse'), axis=0)
    multiple = (BIDI_BATCH_BLOCK if xgf.shape[1] >= BIDI_BATCH_BLOCK else 8)
    xgf, real_b = _pad_batch(xgf, multiple)
    xgr, _ = _pad_batch(xgr, multiple)
    xgf, real_t = _pad_time_multiple(xgf, TIME_BLOCK)
    xgr, _ = _pad_time_multiple(xgr, TIME_BLOCK)
    wf_t = params['weight_hh_l0'].T.astype(STORAGE_DTYPE)
    wr_t = params['weight_hh_l0_reverse'].T.astype(STORAGE_DTYPE)
    return xgf, xgr, wf_t, wr_t, real_b, real_t


def _bidi_out(hsf, hsr, real_b, real_t, dtype):
    hsf = hsf[:real_t, :real_b]
    hsr = jnp.flip(hsr[:real_t], axis=0)[:, :real_b]
    out = jnp.concatenate([hsf, hsr], axis=-1)
    return jnp.swapaxes(out, 0, 1).astype(dtype)


@jax.custom_vjp
def blstm_layer_fused(params, x):
    """One bidirectional layer, interleaved kernel, projection-recompute
    VJP.  x: (B, T, I) -> (B, T, 2H)."""
    xgf, xgr, wf_t, wr_t, real_b, real_t = _bidi_prep(x, params)
    hsf, hsr = _bi_core(xgf, xgr, wf_t, wr_t)
    return _bidi_out(hsf, hsr, real_b, real_t, x.dtype)


def _layer_fwd(params, x):
    xgf, xgr, wf_t, wr_t, real_b, real_t = _bidi_prep(x, params)
    hsf, hsr, csf, csr = _bi_core_fwd_impl(xgf, xgr, wf_t, wr_t)
    out = _bidi_out(hsf, hsr, real_b, real_t, x.dtype)
    return out, (params, x, hsf, hsr, csf, csr, real_b, real_t)


def _layer_bwd(residuals, dout):
    params, x, hsf, hsr, csf, csr, real_b, real_t = residuals
    B, T, I = x.shape
    hidden = hsf.shape[-1]

    # Recompute the (padded) input projections — parallel MXU work
    xgf, xgr, wf_t, wr_t, _, _ = _bidi_prep(x, params)
    seq_len, b_pad = xgf.shape[0], xgf.shape[1]

    # Cotangents back into walked (time-major, padded) layout
    dhsf = jnp.swapaxes(dout[..., :hidden], 0, 1)            # (T, B, H)
    dhsr = jnp.flip(jnp.swapaxes(dout[..., hidden:], 0, 1), axis=0)
    pad_t = seq_len - real_t
    pad_b = b_pad - B

    def pad_ct(d):
        return jnp.pad(d.astype(jnp.float32),
                       [(0, pad_t), (0, pad_b), (0, 0)])

    dhsf = pad_ct(dhsf)
    # reverse cotangent flip happens in original coordinates; padding goes
    # to the END of the walked order like the inputs
    dhsr = pad_ct(dhsr)

    def prevs(hs, cs):
        zeros = jnp.zeros((1,) + hs.shape[1:], hs.dtype)
        return (jnp.concatenate([zeros, hs[:-1]], axis=0),
                jnp.concatenate([zeros, cs[:-1]], axis=0))

    hpf, cpf = prevs(hsf, csf)
    hpr, cpr = prevs(hsr, csr)

    bb = min(b_pad, BIDI_BATCH_BLOCK)
    nb = b_pad // bb
    k = TIME_BLOCK
    ntb = seq_len // k
    gh = 4 * hidden
    rev = lambda i, t: ((ntb - 1 - t), i, 0)  # noqa: E731
    xg_s = pl.BlockSpec((k, bb, gh), rev, memory_space=pltpu.VMEM)
    w_s = pl.BlockSpec((hidden, gh), lambda i, t: (0, 0),
                       memory_space=pltpu.VMEM)
    h_s = pl.BlockSpec((k, bb, hidden), rev, memory_space=pltpu.VMEM)
    dxgf, dxgr, dwf, dwr = pl.pallas_call(
        functools.partial(_bi_bwd_kernel, hidden=hidden, time_block=k),
        grid=(nb, ntb),
        in_specs=[xg_s, xg_s, w_s, w_s,
                  h_s, h_s, h_s, h_s,
                  h_s, h_s, h_s, h_s],
        out_specs=[xg_s, xg_s, w_s, w_s],
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, b_pad, gh), xgf.dtype),
            jax.ShapeDtypeStruct((seq_len, b_pad, gh), xgf.dtype),
            jax.ShapeDtypeStruct((hidden, gh), jnp.float32),
            jax.ShapeDtypeStruct((hidden, gh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((hidden, gh), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((hidden, gh), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(xgf, xgr, wf_t, wr_t, hpf, cpf, csf, dhsf, hpr, cpr, csr, dhsr)

    # Un-pad, back to (B, T, 4H) batch-major; reverse stream un-flipped
    dxgf = jnp.swapaxes(dxgf[:real_t, :B].astype(jnp.float32), 0, 1)
    dxgr = jnp.swapaxes(
        jnp.flip(dxgr[:real_t], axis=0)[:, :B].astype(jnp.float32), 0, 1)

    xf32 = x.astype(jnp.float32)
    d_params = {}
    for suffix, dxg, dwhh in (('', dxgf, dwf), ('_reverse', dxgr, dwr)):
        d_params['weight_ih_l0' + suffix] = jnp.einsum(
            'btg,bti->gi', dxg, xf32)
        db = jnp.sum(dxg, axis=(0, 1))
        d_params['bias_ih_l0' + suffix] = db
        d_params['bias_hh_l0' + suffix] = db
        d_params['weight_hh_l0' + suffix] = dwhh.T
    dx = (dxgf @ params['weight_ih_l0'].astype(jnp.float32)
          + dxgr @ params['weight_ih_l0_reverse'].astype(jnp.float32))
    return d_params, dx.astype(x.dtype)


blstm_layer_fused.defvjp(_layer_fwd, _layer_bwd)


# ---------------------------------------------------------------------------
# Fully-fused layer: in-kernel input projections
# ---------------------------------------------------------------------------
# The xg = x @ W_ih^T tensors are (T, B, 4H) per direction — at flagship
# dims ~1.5 GB each in bf16, written once and re-read by the recurrence.
# Streaming the raw x blocks (T, B, F: ~3x smaller than ONE xg) and doing
# the input projection on the MXU inside the serial loop removes that HBM
# round-trip entirely; in the latency-bound regime the extra per-step
# matmul rides in MXU idle slots.  Backward accumulates dW_ih in VMEM and
# recomputes the gates from x (no xg residual at all).

def _ff_fwd_kernel(xs_ref, xm_ref, wihf_ref, wihr_ref, bf_ref, br_ref,
                   wf_ref, wr_ref,
                   hsf_ref, hsr_ref, csf_ref, csr_ref,
                   hf_scr, cf_scr, hr_scr, cr_scr, *, hidden, time_block,
                   pad_t):
    """Both directions in one grid walk, NO flipped input copy.

    ``xs_ref`` walks the input forward (block ``t``); ``xm_ref`` is the
    SAME array with the mirrored block map (``ntb-1-t``) — the reverse
    direction reads it at within-block offset ``time_block-1-k`` and
    writes its states back at that mirrored position, so ``hsr``/``csr``
    come out in ORIGINAL time order.  Kills the ~1 GB/layer ``rev``
    allocations that OOM'd batch 320/384 (TPU_R4K/L post-mortem).

    ``pad_t`` (static): time pads sit at the END of ``xs``, which the
    reverse scan visits FIRST — its state is re-zeroed at scan position
    ``pad_t`` (the first real frame).  Zero overhead when ``pad_t == 0``.
    """
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        cf_scr[:] = jnp.zeros_like(cf_scr)
        hr_scr[:] = jnp.zeros_like(hr_scr)
        cr_scr[:] = jnp.zeros_like(cr_scr)

    def cell(x_t, b_ref, wih_ref, whh_ref, h, c):
        gates = (jnp.dot(x_t, wih_ref[:],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(h.astype(whh_ref.dtype), whh_ref[:],
                           preferred_element_type=jnp.float32)
                 + b_ref[:].astype(jnp.float32))
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return h, c

    def step(k, _):
        km = time_block - 1 - k
        hf, cf = cell(xs_ref[k], bf_ref, wihf_ref, wf_ref,
                      hf_scr[:], cf_scr[:])
        hr_in, cr_in = hr_scr[:], cr_scr[:]
        if pad_t:
            first_real = (tb * time_block + k) == pad_t
            hr_in = jnp.where(first_real, 0.0, hr_in)
            cr_in = jnp.where(first_real, 0.0, cr_in)
        hr, cr = cell(xm_ref[km], br_ref, wihr_ref, wr_ref, hr_in, cr_in)
        hf_scr[:] = hf
        cf_scr[:] = cf
        hr_scr[:] = hr
        cr_scr[:] = cr
        hsf_ref[k] = hf.astype(hsf_ref.dtype)
        csf_ref[k] = cf.astype(csf_ref.dtype)
        hsr_ref[km] = hr.astype(hsr_ref.dtype)
        csr_ref[km] = cr.astype(csr_ref.dtype)
        return 0

    jax.lax.fori_loop(0, time_block, step, 0)


def _ff_bwd_kernel(xs_ref, xm_ref, wihf_ref, wihr_ref, bf_ref, br_ref,
                   wf_ref, wr_ref,
                   hpf_ref, cpf_ref, cf_ref, dhsf_ref,
                   hpr_ref, cpr_ref, cr_ref, dhsr_ref,
                   dxa_ref, dxb_ref, dwihf_ref, dwihr_ref,
                   dbf_ref, dbr_ref, dwf_ref, dwr_ref,
                   dhf_scr, dcf_scr, dwf_scr, dwihf_scr, dbf_scr,
                   dhr_scr, dcr_scr, dwr_scr, dwihr_scr, dbr_scr,
                   *, hidden, time_block, pad_t):
    """Backward, no flipped tensors anywhere.

    Forward-direction operands (``xs``, ``hpf/cpf/cf/dhsf``, ``dxa``)
    walk the MIRRORED block map at within-block index ``k`` descending
    (its scan order backward).  Reverse-direction operands (``xm`` = the
    same input array, ``hpr/cpr/cr/dhsr``, ``dxb``) are ALL stored in
    original time order and walk the identity map at index ``j``
    ascending — which is that scan's order backward.  ``dxb`` therefore
    needs no flip after the kernel.

    ``pad_t`` (static): the reverse scan re-zeroed its state at scan
    position ``pad_t`` (first real frame = original index
    ``real_t - 1``), so the recompute forces ``h_prev/c_prev`` to zero
    there, and the carried cotangent is cut inside the pad region.
    """
    tb = pl.program_id(1)
    bblk = pl.program_id(0)
    n_tb = pl.num_programs(1)

    @pl.when(tb == 0)
    def _():
        for scr in (dhf_scr, dcf_scr, dwf_scr, dwihf_scr, dbf_scr,
                    dhr_scr, dcr_scr, dwr_scr, dwihr_scr, dbr_scr):
            scr[:] = jnp.zeros_like(scr)

    def one_direction(k, x_ref, b_ref, wih_ref, w_ref, hp_ref, cp_ref,
                      c_ref, dhs_ref, dx_ref, dh_scr, dc_scr, dw_scr,
                      dwih_scr, db_scr, zero_prev=None, cut_carry=None):
        x_t = x_ref[k]
        h_prev = hp_ref[k]
        c_prev = cp_ref[k].astype(jnp.float32)
        if zero_prev is not None:
            h_prev = jnp.where(zero_prev, 0, h_prev)
            c_prev = jnp.where(zero_prev, 0, c_prev)
        c_t = c_ref[k].astype(jnp.float32)

        gates = (jnp.dot(x_t, wih_ref[:],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(h_prev, w_ref[:],
                           preferred_element_type=jnp.float32)
                 + b_ref[:].astype(jnp.float32))
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])

        carried_dh, carried_dc = dh_scr[:], dc_scr[:]
        if cut_carry is not None:
            carried_dh = jnp.where(cut_carry, 0.0, carried_dh)
            carried_dc = jnp.where(cut_carry, 0.0, carried_dc)
        dh = carried_dh + dhs_ref[k].astype(jnp.float32)
        tanh_c = jnp.tanh(c_t)
        do = dh * tanh_c
        dc = carried_dc + dh * o * (1 - tanh_c * tanh_c)
        di = dc * g
        df = dc * c_prev
        dg = dc * i
        dgates = jnp.concatenate([
            di * i * (1 - i),
            df * f * (1 - f),
            dg * (1 - g * g),
            do * o * (1 - o),
        ], axis=1)

        dgm = _mm_cast(dgates, wih_ref)
        dx_ref[k] = jnp.dot(
            dgm, wih_ref[:].T.astype(dgm.dtype),
            preferred_element_type=jnp.float32).astype(dx_ref.dtype)
        dwih_scr[:] += jnp.dot(x_t.T.astype(dgm.dtype), dgm,
                               preferred_element_type=jnp.float32)
        db_scr[:] += jnp.sum(dgates, axis=0, keepdims=True)
        dw_scr[:] += jnp.dot(h_prev.T.astype(dgm.dtype), dgm,
                             preferred_element_type=jnp.float32)
        dh_scr[:] = jnp.dot(dgm, w_ref[:].T.astype(dgm.dtype),
                            preferred_element_type=jnp.float32)
        dc_scr[:] = dc * f

    def step(j, _):
        k = time_block - 1 - j
        one_direction(k, xs_ref, bf_ref, wihf_ref, wf_ref, hpf_ref,
                      cpf_ref, cf_ref, dhsf_ref, dxa_ref,
                      dhf_scr, dcf_scr, dwf_scr, dwihf_scr, dbf_scr)
        zero_prev = cut_carry = None
        if pad_t:
            # original index this reverse-direction step recomputes
            oi = tb * time_block + j
            real_t = n_tb * time_block - pad_t
            zero_prev = oi == real_t - 1   # the forward's state reset
            cut_carry = oi >= real_t       # no grad into the pad frames
        one_direction(j, xm_ref, br_ref, wihr_ref, wr_ref, hpr_ref,
                      cpr_ref, cr_ref, dhsr_ref, dxb_ref,
                      dhr_scr, dcr_scr, dwr_scr, dwihr_scr, dbr_scr,
                      zero_prev=zero_prev, cut_carry=cut_carry)
        return 0

    jax.lax.fori_loop(0, time_block, step, 0)

    @pl.when(tb == n_tb - 1)
    def _():
        pairs = ((dwf_ref, dwf_scr), (dwr_ref, dwr_scr),
                 (dwihf_ref, dwihf_scr), (dwihr_ref, dwihr_scr),
                 (dbf_ref, dbf_scr), (dbr_ref, dbr_scr))

        @pl.when(bblk == 0)
        def _():
            for ref, scr in pairs:
                ref[:] = scr[:]

        @pl.when(bblk > 0)
        def _():
            for ref, scr in pairs:
                ref[:] += scr[:]

        for _, scr in pairs:
            scr[:] = jnp.zeros_like(scr)


def _ff_prep(x, params):
    xs = jnp.swapaxes(x, 0, 1).astype(STORAGE_DTYPE)      # (T, B, F)
    multiple = (BIDI_BATCH_BLOCK if xs.shape[1] >= BIDI_BATCH_BLOCK else 8)
    xs, real_b = _pad_batch(xs, multiple)
    xs, real_t = _pad_time_multiple(xs, TIME_BLOCK)

    def w_of(suffix):
        wih = params['weight_ih_l0' + suffix].T.astype(STORAGE_DTYPE)
        b = (params['bias_ih_l0' + suffix]
             + params['bias_hh_l0' + suffix])[None].astype(jnp.float32)
        whh = params['weight_hh_l0' + suffix].T.astype(STORAGE_DTYPE)
        return wih, b, whh                               # (F,4H),(1,4H),(H,4H)

    wihf, bf, wf = w_of('')
    wihr, br, wr = w_of('_reverse')
    return xs, wihf, wihr, bf, br, wf, wr, real_b, real_t


def _ff_fwd_impl(xs, wihf, wihr, bf, br, wf, wr, pad_t):
    seq_len, b, feat = xs.shape
    hidden = wf.shape[0]
    gh = 4 * hidden
    bb = min(b, BIDI_BATCH_BLOCK)
    nb = b // bb
    k = TIME_BLOCK
    ntb = seq_len // k
    x_s = pl.BlockSpec((k, bb, feat), lambda i, t: (t, i, 0),
                       memory_space=pltpu.VMEM)
    # The reverse direction reads the SAME xs through the mirrored block
    # map — the flipped copy (`rev`, ~1 GB/layer at flagship dims, the
    # TPU_R4K/L OOM allocation) no longer exists.
    x_m = pl.BlockSpec((k, bb, feat), lambda i, t: (ntb - 1 - t, i, 0),
                       memory_space=pltpu.VMEM)
    wih_s = pl.BlockSpec((feat, gh), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM)
    b_s = pl.BlockSpec((1, gh), lambda i, t: (0, 0),
                       memory_space=pltpu.VMEM)
    w_s = pl.BlockSpec((hidden, gh), lambda i, t: (0, 0),
                       memory_space=pltpu.VMEM)
    h_s = pl.BlockSpec((k, bb, hidden), lambda i, t: (t, i, 0),
                       memory_space=pltpu.VMEM)
    h_m = pl.BlockSpec((k, bb, hidden), lambda i, t: (ntb - 1 - t, i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ff_fwd_kernel, hidden=hidden, time_block=k,
                          pad_t=pad_t),
        grid=(nb, ntb),
        in_specs=[x_s, x_m, wih_s, wih_s, b_s, b_s, w_s, w_s],
        out_specs=[h_s, h_m, h_s, h_m],
        out_shape=[jax.ShapeDtypeStruct((seq_len, b, hidden),
                                        xs.dtype)] * 4,
        scratch_shapes=[pltpu.VMEM((bb, hidden), jnp.float32)] * 4,
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(xs, xs, wihf, wihr, bf, br, wf, wr)


def _bidi_out_orig(hsf, hsr, real_b, real_t, dtype):
    """Assemble (B, T, 2H) when BOTH state sequences are stored in
    original time order (the no-flip fullfused kernels)."""
    out = jnp.concatenate([hsf[:real_t, :real_b], hsr[:real_t, :real_b]],
                          axis=-1)
    return jnp.swapaxes(out, 0, 1).astype(dtype)


@jax.custom_vjp
def blstm_layer_fullfused(params, x):
    """Bidirectional layer with in-kernel input projections.

    x: (B, T, F) -> (B, T, 2H).  No xg tensors ever exist in HBM, and no
    time-flipped copies either (in-kernel reversal via mirrored block
    maps).
    """
    xs, wihf, wihr, bf, br, wf, wr, real_b, real_t = _ff_prep(x, params)
    pad_t = xs.shape[0] - real_t
    hsf, hsr, _, _ = _ff_fwd_impl(xs, wihf, wihr, bf, br, wf, wr, pad_t)
    return _bidi_out_orig(hsf, hsr, real_b, real_t, x.dtype)


def _ff_layer_fwd(params, x):
    xs, wihf, wihr, bf, br, wf, wr, real_b, real_t = _ff_prep(x, params)
    pad_t = xs.shape[0] - real_t
    hsf, hsr, csf, csr = _ff_fwd_impl(xs, wihf, wihr, bf, br, wf, wr, pad_t)
    out = _bidi_out_orig(hsf, hsr, real_b, real_t, x.dtype)
    return out, (params, x, hsf, hsr, csf, csr, real_b, real_t)


def _ff_layer_bwd(residuals, dout):
    params, x, hsf, hsr, csf, csr, real_b, real_t = residuals
    B, T, feat = x.shape
    hidden = hsf.shape[-1]
    gh = 4 * hidden

    xs, wihf, wihr, bf, br, wf, wr, _, _ = _ff_prep(x, params)
    seq_len, b_pad = xs.shape[0], xs.shape[1]

    # NO flips: the reverse direction's tensors are all stored in original
    # time order; its backward walks the identity block map (ascending
    # original time == descending its own scan order) while the forward
    # direction walks the mirrored map.
    dhsf = jnp.swapaxes(dout[..., :hidden], 0, 1)
    dhsr = jnp.swapaxes(dout[..., hidden:], 0, 1)
    pad_t = seq_len - real_t
    pad_b = b_pad - B

    def pad_ct(d):
        # dhs streams in the STORAGE dtype: under bf16 streaming the
        # incoming dout is already bf16-quantized (produced by a bf16 dx
        # or head), so an f32 pad+convert only doubled the bytes of a
        # (T, B*S, H) tensor x4 (a top HLO movement-op family); the
        # kernel accumulates dh in an f32 scratch regardless.
        return jnp.pad(d.astype(STORAGE_DTYPE),
                       [(0, pad_t), (0, pad_b), (0, 0)])

    dhsf = pad_ct(dhsf)
    dhsr = pad_ct(dhsr)

    def prevs(hs, cs):
        zeros = jnp.zeros((1,) + hs.shape[1:], hs.dtype)
        return (jnp.concatenate([zeros, hs[:-1]], axis=0),
                jnp.concatenate([zeros, cs[:-1]], axis=0))

    def prevs_rev(hs, cs):
        # original-order reverse scan: the state BEFORE consuming x_i is
        # the state at i+1 (the scan runs T-1 -> 0)
        zeros = jnp.zeros((1,) + hs.shape[1:], hs.dtype)
        return (jnp.concatenate([hs[1:], zeros], axis=0),
                jnp.concatenate([cs[1:], zeros], axis=0))

    hpf, cpf = prevs(hsf, csf)
    hpr, cpr = prevs_rev(hsr, csr)

    bb = min(b_pad, BIDI_BATCH_BLOCK)
    nb = b_pad // bb
    k = TIME_BLOCK
    ntb = seq_len // k
    rev = lambda i, t: ((ntb - 1 - t), i, 0)  # noqa: E731
    fwd = lambda i, t: (t, i, 0)              # noqa: E731
    x_s = pl.BlockSpec((k, bb, feat), rev, memory_space=pltpu.VMEM)
    x_f = pl.BlockSpec((k, bb, feat), fwd, memory_space=pltpu.VMEM)
    wih_s = pl.BlockSpec((feat, gh), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM)
    b_s = pl.BlockSpec((1, gh), lambda i, t: (0, 0),
                       memory_space=pltpu.VMEM)
    w_s = pl.BlockSpec((hidden, gh), lambda i, t: (0, 0),
                       memory_space=pltpu.VMEM)
    h_s = pl.BlockSpec((k, bb, hidden), rev, memory_space=pltpu.VMEM)
    h_f = pl.BlockSpec((k, bb, hidden), fwd, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_ff_bwd_kernel, hidden=hidden, time_block=k,
                          pad_t=pad_t),
        grid=(nb, ntb),
        in_specs=[x_s, x_f, wih_s, wih_s, b_s, b_s, w_s, w_s,
                  h_s, h_s, h_s, h_s,
                  h_f, h_f, h_f, h_f],
        out_specs=[x_s, x_f, wih_s, wih_s, b_s, b_s, w_s, w_s],
        out_shape=[
            # dx streams in the storage dtype (halves the two biggest
            # backward writes at flagship dims); the f32 per-direction
            # sum happens outside, weight grads stay f32.
            jax.ShapeDtypeStruct((seq_len, b_pad, feat), xs.dtype),
            jax.ShapeDtypeStruct((seq_len, b_pad, feat), xs.dtype),
            jax.ShapeDtypeStruct((feat, gh), jnp.float32),
            jax.ShapeDtypeStruct((feat, gh), jnp.float32),
            jax.ShapeDtypeStruct((1, gh), jnp.float32),
            jax.ShapeDtypeStruct((1, gh), jnp.float32),
            jax.ShapeDtypeStruct((hidden, gh), jnp.float32),
            jax.ShapeDtypeStruct((hidden, gh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((hidden, gh), jnp.float32),
            pltpu.VMEM((feat, gh), jnp.float32),
            pltpu.VMEM((1, gh), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((hidden, gh), jnp.float32),
            pltpu.VMEM((feat, gh), jnp.float32),
            pltpu.VMEM((1, gh), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(xs, xs, wihf, wihr, bf, br, wf, wr,
      hpf, cpf, csf, dhsf, hpr, cpr, csr, dhsr)
    dxa, dxb, dwihf, dwihr, dbf, dbr, dwhf, dwhr = outs

    # dxb is already in original time order (identity out map) — no flip.
    dxa = dxa[:real_t, :B]
    dxb = dxb[:real_t, :B]
    # Upcast each direction before the sum (one bf16 rounding less, same
    # policy as _ffs_layer_bwd), then cast BEFORE the (T, B) -> (B, T)
    # transpose: the f32 transpose of the summed dx was a top HLO movement
    # op (1.33 GB at the 513-wide flagship layer) — only the layout move
    # runs in the storage dtype.
    dsum = dxa.astype(jnp.float32) + dxb.astype(jnp.float32)
    dx = jnp.swapaxes(dsum.astype(x.dtype), 0, 1)

    d_params = {}
    for suffix, dwih, db, dwhh in (('', dwihf, dbf, dwhf),
                                   ('_reverse', dwihr, dbr, dwhr)):
        d_params['weight_ih_l0' + suffix] = dwih.T
        d_params['bias_ih_l0' + suffix] = db[0]
        d_params['bias_hh_l0' + suffix] = db[0]
        d_params['weight_hh_l0' + suffix] = dwhh.T
    return d_params, dx


blstm_layer_fullfused.defvjp(_ff_layer_fwd, _ff_layer_bwd)


# ---------------------------------------------------------------------------
# Block-spilled fully-fused layer: boundary-state residuals only
# ---------------------------------------------------------------------------
# The fullfused no-remat backward keeps 4x (T, B, H) state sequences
# (hs/cs per direction) alive from forward to backward — ~1.5 GB/layer at
# flagship dims, HBM-OOM with every folded layer no-remat (chip-measured
# 20.7 G vs 15.75 G).  This variant spills only:
#   - hs (the layer OUTPUT — alive downstream anyway), and
#   - the (h, c) carry at every SPILL_BLOCK'th step boundary (T/S_ blocks).
# No cs sequence ever reaches HBM (halves the forward's state writes), and
# the backward reconstructs the in-block cell states in VMEM.  The backward
# is also restructured around the true dependency graph:
#   phase 1: gate pre-activations for the whole block — h_prev comes from
#            the SAVED hs, so every step is independent -> back-to-back MXU
#            matmuls, no serial stalls;
#   phase 2: cell-state reconstruction c_j = f*c_{j-1} + i*g — serial but
#            VPU-only (elementwise), no matmul on the critical path;
#   phase 3: reverse walk — the only serial matmul left is the dh backprop
#            (bb, 4H) x (4H, H); dgates overwrite the gate scratch in place;
#   phase 4: dx / dW_ih / dW_hh / db — independent per step, batched MXU.
# vs the merged reverse walk of ``_ff_bwd_kernel`` (whose in-order VLIW
# execution serializes 3 matmuls + all VPU work per step), the serial
# critical path shrinks ~3x; chip target bwd ~<2.3x fwd (TODO.md round 3).

#: Steps per spilled boundary (must be a multiple of TIME_BLOCK; the
#: backward grid walks blocks of this size).  8 keeps the backward's VMEM
#: working set (~73 MB at flagship dims, bb=256) under the scoped budget.
SPILL_BLOCK = int(_os.environ.get('TSSEP_PALLAS_SPILL_BLOCK', '8'))


def _ffs_fwd_kernel(xs_ref, xr_ref, wihf_ref, wihr_ref, bf_ref, br_ref,
                    wf_ref, wr_ref,
                    hsf_ref, hsr_ref, cbf_ref, cbr_ref,
                    hf_scr, cf_scr, hr_scr, cr_scr, *, hidden, time_block):
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        cf_scr[:] = jnp.zeros_like(cf_scr)
        hr_scr[:] = jnp.zeros_like(hr_scr)
        cr_scr[:] = jnp.zeros_like(cr_scr)

    # Cell-state carry entering this time block -> one slot per grid step
    # (the backward slices every spill_ratio'th slot; the h carry is NOT
    # stored — it is hs[block_start - 1], already a forward output).
    # Unconditional store with a t-indexed BlockSpec: a `t // r` revisiting
    # block + pl.when costs more (write-back every grid step anyway, plus
    # a pipeline bubble) than the small extra HBM.
    cbf_ref[0] = cf_scr[:].astype(cbf_ref.dtype)
    cbr_ref[0] = cr_scr[:].astype(cbr_ref.dtype)

    def cell(x_t, b_ref, wih_ref, whh_ref, h, c):
        gates = (jnp.dot(x_t, wih_ref[:],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(h.astype(whh_ref.dtype), whh_ref[:],
                           preferred_element_type=jnp.float32)
                 + b_ref[:].astype(jnp.float32))
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return h, c

    def step(k, _):
        hf, cf = cell(xs_ref[k], bf_ref, wihf_ref, wf_ref,
                      hf_scr[:], cf_scr[:])
        hr, cr = cell(xr_ref[k], br_ref, wihr_ref, wr_ref,
                      hr_scr[:], cr_scr[:])
        hf_scr[:] = hf
        cf_scr[:] = cf
        hr_scr[:] = hr
        cr_scr[:] = cr
        hsf_ref[k] = hf.astype(hsf_ref.dtype)
        hsr_ref[k] = hr.astype(hsr_ref.dtype)
        return 0

    jax.lax.fori_loop(0, time_block, step, 0)


def _ffs_bwd_kernel(xs_ref, xr_ref, wihf_ref, wihr_ref, bf_ref, br_ref,
                    wf_ref, wr_ref,
                    hsf_ref, hbf_ref, cbf_ref, dhsf_ref,
                    hsr_ref, hbr_ref, cbr_ref, dhsr_ref,
                    dxa_ref, dxb_ref, dwihf_ref, dwihr_ref,
                    dbf_ref, dbr_ref, dwf_ref, dwr_ref,
                    gf_scr, gr_scr, cqf_scr, cqr_scr, hpf_scr, hpr_scr,
                    dhf_scr, dcf_scr, dwf_scr, dwihf_scr, dbf_scr,
                    dhr_scr, dcr_scr, dwr_scr, dwihr_scr, dbr_scr,
                    *, hidden, spill):
    tb = pl.program_id(1)
    bblk = pl.program_id(0)
    n_tb = pl.num_programs(1)

    @pl.when(tb == 0)
    def _():
        for scr in (dhf_scr, dcf_scr, dwf_scr, dwihf_scr, dbf_scr,
                    dhr_scr, dcr_scr, dwr_scr, dwihr_scr, dbr_scr):
            scr[:] = jnp.zeros_like(scr)

    def one_direction(x_ref, b_ref, wih_ref, w_ref, hs_ref, hb_ref,
                      cb_ref, dhs_ref, dx_ref, g_scr, cq_scr, hp_scr,
                      dh_scr, dc_scr, dw_scr, dwih_scr, db_scr):
        # h_prev for every in-block step, built with STATIC slices (the
        # saved hs shifted by one; entry state from the boundary ref)
        hp_scr[0] = hb_ref[0].astype(jnp.float32)
        hp_scr[1:] = hs_ref[:spill - 1].astype(jnp.float32)

        # phase 1: gate pre-activations for the WHOLE block — one batched
        # MXU matmul pair over (spill*bb) rows, zero serial structure
        xb = x_ref[:]
        s_, bb_, feat_ = xb.shape
        xb2 = xb.reshape(s_ * bb_, feat_)
        hpb = hp_scr[:].reshape(s_ * bb_, hidden)
        g = (jnp.dot(xb2, wih_ref[:], preferred_element_type=jnp.float32)
             + jnp.dot(hpb.astype(w_ref.dtype), w_ref[:],
                       preferred_element_type=jnp.float32)
             + b_ref[:].astype(jnp.float32))
        g_scr[:] = g.reshape(s_, bb_, 4 * hidden)

        # phase 2: cell-state reconstruction — serial but elementwise only
        # (cq slot j holds c BEFORE step j; slot j+1 after)
        cq_scr[0] = cb_ref[0].astype(jnp.float32)

        def c_step(j, _):
            gj = g_scr[j]
            i = jax.nn.sigmoid(gj[:, :hidden])
            f = jax.nn.sigmoid(gj[:, hidden:2 * hidden])
            gg = jnp.tanh(gj[:, 2 * hidden:3 * hidden])
            cq_scr[j + 1] = f * cq_scr[j] + i * gg
            return 0

        jax.lax.fori_loop(0, spill, c_step, 0)

        # phase 3: reverse walk — one serial matmul per step (dh backprop);
        # dgates overwrite the gate scratch slot in place
        def b_step(jj, _):
            j = spill - 1 - jj
            gj = g_scr[j]
            i = jax.nn.sigmoid(gj[:, :hidden])
            f = jax.nn.sigmoid(gj[:, hidden:2 * hidden])
            gg = jnp.tanh(gj[:, 2 * hidden:3 * hidden])
            o = jax.nn.sigmoid(gj[:, 3 * hidden:])
            c_t = cq_scr[j + 1]
            c_prev = cq_scr[j]
            dh = dh_scr[:] + dhs_ref[j].astype(jnp.float32)
            tanh_c = jnp.tanh(c_t)
            do = dh * tanh_c
            dc = dc_scr[:] + dh * o * (1 - tanh_c * tanh_c)
            di = dc * gg
            df = dc * c_prev
            dg = dc * i
            dgates = jnp.concatenate([
                di * i * (1 - i),
                df * f * (1 - f),
                dg * (1 - gg * gg),
                do * o * (1 - o),
            ], axis=1)
            g_scr[j] = dgates
            dgm = _mm_cast(dgates, w_ref)
            dh_scr[:] = jnp.dot(dgm, w_ref[:].T.astype(dgm.dtype),
                                preferred_element_type=jnp.float32)
            dc_scr[:] = dc * f
            return 0

        jax.lax.fori_loop(0, spill, b_step, 0)

        # phase 4: dx / weight grads — batched MXU matmuls over the block
        dgb = g_scr[:].reshape(s_ * bb_, 4 * hidden)
        dgm = _mm_cast(dgb, wih_ref)
        dx_ref[:] = jnp.dot(
            dgm, wih_ref[:].T.astype(dgm.dtype),
            preferred_element_type=jnp.float32
        ).reshape(s_, bb_, feat_).astype(dx_ref.dtype)
        dgs = _mm_cast(dgb, w_ref)
        dwih_scr[:] += jnp.dot(xb2.T.astype(dgs.dtype), dgs,
                               preferred_element_type=jnp.float32)
        dw_scr[:] += jnp.dot(hpb.T.astype(dgs.dtype), dgs,
                             preferred_element_type=jnp.float32)
        db_scr[:] += jnp.sum(dgb, axis=0, keepdims=True)

    one_direction(xs_ref, bf_ref, wihf_ref, wf_ref, hsf_ref, hbf_ref,
                  cbf_ref, dhsf_ref, dxa_ref, gf_scr, cqf_scr, hpf_scr,
                  dhf_scr, dcf_scr, dwf_scr, dwihf_scr, dbf_scr)
    one_direction(xr_ref, br_ref, wihr_ref, wr_ref, hsr_ref, hbr_ref,
                  cbr_ref, dhsr_ref, dxb_ref, gr_scr, cqr_scr, hpr_scr,
                  dhr_scr, dcr_scr, dwr_scr, dwihr_scr, dbr_scr)

    @pl.when(tb == n_tb - 1)
    def _():
        pairs = ((dwf_ref, dwf_scr), (dwr_ref, dwr_scr),
                 (dwihf_ref, dwihf_scr), (dwihr_ref, dwihr_scr),
                 (dbf_ref, dbf_scr), (dbr_ref, dbr_scr))

        @pl.when(bblk == 0)
        def _():
            for ref, scr in pairs:
                ref[:] = scr[:]

        @pl.when(bblk > 0)
        def _():
            for ref, scr in pairs:
                ref[:] += scr[:]

        for _, scr in pairs:
            scr[:] = jnp.zeros_like(scr)


def _ffs_prep(x, params):
    """Like ``_ff_prep`` but pads time to the spill-block multiple."""
    assert SPILL_BLOCK % TIME_BLOCK == 0, (SPILL_BLOCK, TIME_BLOCK)
    xs = jnp.swapaxes(x, 0, 1).astype(STORAGE_DTYPE)      # (T, B, F)
    xr = jnp.flip(xs, axis=0)
    multiple = (BIDI_BATCH_BLOCK if xs.shape[1] >= BIDI_BATCH_BLOCK else 8)
    xs, real_b = _pad_batch(xs, multiple)
    xr, _ = _pad_batch(xr, multiple)
    xs, real_t = _pad_time_multiple(xs, SPILL_BLOCK)
    xr, _ = _pad_time_multiple(xr, SPILL_BLOCK)

    def w_of(suffix):
        wih = params['weight_ih_l0' + suffix].T.astype(STORAGE_DTYPE)
        b = (params['bias_ih_l0' + suffix]
             + params['bias_hh_l0' + suffix])[None].astype(jnp.float32)
        whh = params['weight_hh_l0' + suffix].T.astype(STORAGE_DTYPE)
        return wih, b, whh

    wihf, bf, wf = w_of('')
    wihr, br, wr = w_of('_reverse')
    return xs, xr, wihf, wihr, bf, br, wf, wr, real_b, real_t


def _ffs_fwd_impl(xs, xr, wihf, wihr, bf, br, wf, wr):
    seq_len, b, feat = xs.shape
    hidden = wf.shape[0]
    gh = 4 * hidden
    bb = min(b, BIDI_BATCH_BLOCK)
    nb = b // bb
    k = TIME_BLOCK
    ntb = seq_len // k
    r = SPILL_BLOCK // k
    nsb = seq_len // SPILL_BLOCK
    x_s = pl.BlockSpec((k, bb, feat), lambda i, t: (t, i, 0),
                       memory_space=pltpu.VMEM)
    wih_s = pl.BlockSpec((feat, gh), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM)
    b_s = pl.BlockSpec((1, gh), lambda i, t: (0, 0),
                       memory_space=pltpu.VMEM)
    w_s = pl.BlockSpec((hidden, gh), lambda i, t: (0, 0),
                       memory_space=pltpu.VMEM)
    h_s = pl.BlockSpec((k, bb, hidden), lambda i, t: (t, i, 0),
                       memory_space=pltpu.VMEM)
    bound_s = pl.BlockSpec((1, bb, hidden), lambda i, t: (t, i, 0),
                           memory_space=pltpu.VMEM)
    hsf, hsr, cbt_f, cbt_r = pl.pallas_call(
        functools.partial(_ffs_fwd_kernel, hidden=hidden, time_block=k),
        grid=(nb, ntb),
        in_specs=[x_s, x_s, wih_s, wih_s, b_s, b_s, w_s, w_s],
        out_specs=[h_s, h_s, bound_s, bound_s],
        # Boundaries in storage dtype: the non-spill backward already reads
        # its full cs/hp/cp sequences in storage dtype, so bf16 boundaries
        # are no looser (and 2x smaller residuals under bf16 streaming).
        out_shape=(
            [jax.ShapeDtypeStruct((seq_len, b, hidden), xs.dtype)] * 2
            + [jax.ShapeDtypeStruct((ntb, b, hidden), xs.dtype)] * 2),
        scratch_shapes=[pltpu.VMEM((bb, hidden), jnp.float32)] * 4,
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(xs, xr, wihf, wihr, bf, br, wf, wr)
    # Per-time-block entry carries -> per-SPILL-block entry carries.
    return hsf, hsr, cbt_f[::r], cbt_r[::r]


@jax.custom_vjp
def blstm_layer_fullfused_spill(params, x):
    """Fully-fused bidirectional layer with boundary-spilled residuals.

    x: (B, T, F) -> (B, T, 2H).  Numerically identical forward to
    ``blstm_layer_fullfused``; the VJP keeps only hs + the c carry at
    every SPILL_BLOCK'th step boundary (the h carry there is hs itself),
    so no-remat backward speed fits in HBM at every folded flagship layer
    simultaneously.
    """
    xs, xr, wihf, wihr, bf, br, wf, wr, real_b, real_t = _ffs_prep(x, params)
    hsf, hsr, *_ = _ffs_fwd_impl(xs, xr, wihf, wihr, bf, br, wf, wr)
    return _bidi_out(hsf, hsr, real_b, real_t, x.dtype)


def _ffs_layer_fwd(params, x):
    xs, xr, wihf, wihr, bf, br, wf, wr, real_b, real_t = _ffs_prep(x, params)
    hsf, hsr, cbf, cbr = _ffs_fwd_impl(
        xs, xr, wihf, wihr, bf, br, wf, wr)
    out = _bidi_out(hsf, hsr, real_b, real_t, x.dtype)
    return out, (params, x, hsf, hsr, cbf, cbr, real_b, real_t)


def _spill_bwd_bb(feat, hidden, b_pad):
    """Largest batch block whose backward-kernel VMEM (scratches +
    double-buffered streamed blocks, with (8, 128)-tile padding) fits the
    scoped budget.  Chip-measured: bb=256 at feat=513/H=300 allocates
    104.81M against the 100M limit (and this model predicts 103M), so the
    513-wide first folded layer drops to bb=128 while the 320-wide layers
    keep 256."""
    r128 = lambda v: -(-v // 128) * 128  # noqa: E731
    gh_p = r128(4 * hidden)
    h_p = r128(hidden)
    f_p = r128(feat)
    s_ = SPILL_BLOCK
    # weights in (bf16) + weight-grad outs (f32) + weight-grad scratches
    const = 2 * (f_p * gh_p * 2 + h_p * gh_p * 2 + gh_p * 4
                 + 2 * (f_p * gh_p * 4 + h_p * gh_p * 4 + gh_p * 4))
    bb = min(b_pad, BIDI_BATCH_BLOCK)
    while bb > 8:
        scr = 2 * (s_ * gh_p * 4 + (s_ + 1) * h_p * 4 + s_ * h_p * 4
                   + 2 * h_p * 4)
        stream = 2 * (2 * s_ * f_p * 2 + s_ * h_p * 2 + s_ * h_p * 4
                      + h_p * 2)
        if const + bb * (scr + 2 * stream) <= 92 * 1024 * 1024:
            break
        bb //= 2
    return bb


def _ffs_layer_bwd(residuals, dout):
    (params, x, hsf, hsr, cbf, cbr, real_b, real_t) = residuals
    B, T, feat = x.shape
    hidden = hsf.shape[-1]
    gh = 4 * hidden

    xs, xr, wihf, wihr, bf, br, wf, wr, _, _ = _ffs_prep(x, params)
    seq_len, b_pad = xs.shape[0], xs.shape[1]

    dhsf = jnp.swapaxes(dout[..., :hidden], 0, 1)
    dhsr = jnp.flip(jnp.swapaxes(dout[..., hidden:], 0, 1), axis=0)
    pad_t = seq_len - real_t
    pad_b = b_pad - B

    def pad_ct(d):
        # storage-dtype dhs: see _ff_layer_bwd (the f32 pad+convert
        # doubled the bytes of an already-bf16-quantized gradient).
        return jnp.pad(d.astype(STORAGE_DTYPE),
                       [(0, pad_t), (0, pad_b), (0, 0)])

    dhsf = pad_ct(dhsf)
    dhsr = pad_ct(dhsr)

    s_ = SPILL_BLOCK
    nsb = seq_len // s_

    def hb_of(hs):
        # h carry entering each spill block: hs one step before the block
        # start (zeros for block 0) — a strided slice of the forward's own
        # output, so the forward never stores h boundaries.
        return jnp.concatenate(
            [jnp.zeros((1,) + hs.shape[1:], hs.dtype),
             hs[s_ - 1::s_][:nsb - 1]], axis=0)

    hbf = hb_of(hsf)
    hbr = hb_of(hsr)

    bb = _spill_bwd_bb(feat, hidden, b_pad)
    nb = b_pad // bb
    rev = lambda i, t: ((nsb - 1 - t), i, 0)  # noqa: E731
    x_s = pl.BlockSpec((s_, bb, feat), rev, memory_space=pltpu.VMEM)
    wih_s = pl.BlockSpec((feat, gh), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM)
    b_s = pl.BlockSpec((1, gh), lambda i, t: (0, 0),
                       memory_space=pltpu.VMEM)
    w_s = pl.BlockSpec((hidden, gh), lambda i, t: (0, 0),
                       memory_space=pltpu.VMEM)
    h_s = pl.BlockSpec((s_, bb, hidden), rev, memory_space=pltpu.VMEM)
    bound_s = pl.BlockSpec((1, bb, hidden), rev, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_ffs_bwd_kernel, hidden=hidden, spill=s_),
        grid=(nb, nsb),
        in_specs=[x_s, x_s, wih_s, wih_s, b_s, b_s, w_s, w_s,
                  h_s, bound_s, bound_s, h_s,
                  h_s, bound_s, bound_s, h_s],
        out_specs=[x_s, x_s, wih_s, wih_s, b_s, b_s, w_s, w_s],
        out_shape=[
            # dx streams in storage dtype (the layer_fused VJP's dxg does
            # the same); the f32 per-direction sum happens outside.
            jax.ShapeDtypeStruct((seq_len, b_pad, feat), xs.dtype),
            jax.ShapeDtypeStruct((seq_len, b_pad, feat), xs.dtype),
            jax.ShapeDtypeStruct((feat, gh), jnp.float32),
            jax.ShapeDtypeStruct((feat, gh), jnp.float32),
            jax.ShapeDtypeStruct((1, gh), jnp.float32),
            jax.ShapeDtypeStruct((1, gh), jnp.float32),
            jax.ShapeDtypeStruct((hidden, gh), jnp.float32),
            jax.ShapeDtypeStruct((hidden, gh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((s_, bb, gh), jnp.float32),       # gf
            pltpu.VMEM((s_, bb, gh), jnp.float32),       # gr
            pltpu.VMEM((s_ + 1, bb, hidden), jnp.float32),  # cqf
            pltpu.VMEM((s_ + 1, bb, hidden), jnp.float32),  # cqr
            pltpu.VMEM((s_, bb, hidden), jnp.float32),   # hpf
            pltpu.VMEM((s_, bb, hidden), jnp.float32),   # hpr
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((hidden, gh), jnp.float32),
            pltpu.VMEM((feat, gh), jnp.float32),
            pltpu.VMEM((1, gh), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((hidden, gh), jnp.float32),
            pltpu.VMEM((feat, gh), jnp.float32),
            pltpu.VMEM((1, gh), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(xs, xr, wihf, wihr, bf, br, wf, wr,
      hsf, hbf, cbf, dhsf, hsr, hbr, cbr, dhsr)
    dxa, dxb, dwihf, dwihr, dbf, dbr, dwhf, dwhr = outs

    dxa = dxa[:real_t, :B].astype(jnp.float32)
    dxb = jnp.flip(dxb[:real_t], axis=0)[:, :B].astype(jnp.float32)
    # cast BEFORE the (T, B) -> (B, T) transpose: the f32 transpose of
    # the summed dx was a top HLO movement op (1.33 GB at the 513-wide
    # flagship layer); the sum stays f32, only the layout move is bf16
    dx = jnp.swapaxes((dxa + dxb).astype(x.dtype), 0, 1)

    d_params = {}
    for suffix, dwih, db, dwhh in (('', dwihf, dbf, dwhf),
                                   ('_reverse', dwihr, dbr, dwhr)):
        d_params['weight_ih_l0' + suffix] = dwih.T
        d_params['bias_ih_l0' + suffix] = db[0]
        d_params['bias_hh_l0' + suffix] = db[0]
        d_params['weight_hh_l0' + suffix] = dwhh.T
    return d_params, dx


blstm_layer_fullfused_spill.defvjp(_ffs_layer_fwd, _ffs_layer_bwd)


# ---------------------------------------------------------------------------
# Conditioned fully-fused layer: (xs * aux) formed in VMEM
# ---------------------------------------------------------------------------
# The 'mul' (LHUC) conditioning materializes h = xs[:, None] * aux[:, :, None]
# as a (B, S, T, F) tensor in HBM (at flagship dims ~2.6 GB bf16) that the
# first post-net layer immediately re-reads.  This variant streams the
# UNconditioned xs blocks (S x smaller) plus the (B, S, F) embeddings and
# forms the product in VMEM right before the in-kernel input projection —
# the conditioned tensor never exists in HBM (VERDICT r2 item 2 / SURVEY
# §2.5 "embedding-broadcast conditioning path").
#
# Layout: a grid batch block covers bbB = BB // S real batch rows (whole
# speaker groups), so the xs block is the same bbB rows for every speaker.
# INSIDE the kernel the folded rows are s-major within the block
# (row = s * bbB + b): the conditioned rows are then built from purely 2D
# per-speaker multiplies + an axis-0 concatenate — Mosaic rejects the
# 3D-broadcast formulation (``x_t[:, None, :] * aux``) at flagship shapes
# ("infer-vector-layout: unsupported shape cast").  The callers translate
# between this kernel layout and the b-major (B, S, ...) user layout with
# one XLA transpose (the same cost class as the time-major swap the
# other kernels already pay).

def _ffc_fwd_kernel(xs_ref, xr_ref, aux_ref, wihf_ref, wihr_ref, bf_ref,
                    br_ref, wf_ref, wr_ref,
                    hsf_ref, hsr_ref, csf_ref, csr_ref,
                    hf_scr, cf_scr, hr_scr, cr_scr, *, hidden, time_block,
                    speakers):
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        cf_scr[:] = jnp.zeros_like(cf_scr)
        hr_scr[:] = jnp.zeros_like(hr_scr)
        cr_scr[:] = jnp.zeros_like(cr_scr)

    def cond(x_t):
        """(bbB, F) -> folded conditioned rows (S*bbB, F), s-major."""
        return jnp.concatenate(
            [x_t * aux_ref[i] for i in range(speakers)], axis=0)

    def cell(x_t, b_ref, wih_ref, whh_ref, h, c):
        gates = (jnp.dot(cond(x_t), wih_ref[:],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(h.astype(whh_ref.dtype), whh_ref[:],
                           preferred_element_type=jnp.float32)
                 + b_ref[:].astype(jnp.float32))
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return h, c

    def step(k, _):
        hf, cf = cell(xs_ref[k], bf_ref, wihf_ref, wf_ref,
                      hf_scr[:], cf_scr[:])
        hr, cr = cell(xr_ref[k], br_ref, wihr_ref, wr_ref,
                      hr_scr[:], cr_scr[:])
        hf_scr[:] = hf
        cf_scr[:] = cf
        hr_scr[:] = hr
        cr_scr[:] = cr
        hsf_ref[k] = hf.astype(hsf_ref.dtype)
        csf_ref[k] = cf.astype(csf_ref.dtype)
        hsr_ref[k] = hr.astype(hsr_ref.dtype)
        csr_ref[k] = cr.astype(csr_ref.dtype)
        return 0

    jax.lax.fori_loop(0, time_block, step, 0)


def _ffc_bwd_kernel(xs_ref, xr_ref, aux_ref, wihf_ref, wihr_ref, bf_ref,
                    br_ref, wf_ref, wr_ref,
                    hpf_ref, cpf_ref, cf_ref, dhsf_ref,
                    hpr_ref, cpr_ref, cr_ref, dhsr_ref,
                    dxa_ref, dxb_ref, daux_ref, dwihf_ref, dwihr_ref,
                    dbf_ref, dbr_ref, dwf_ref, dwr_ref,
                    dhf_scr, dcf_scr, dwf_scr, dwihf_scr, dbf_scr,
                    dhr_scr, dcr_scr, dwr_scr, dwihr_scr, dbr_scr,
                    daux_scr, *, hidden, time_block, speakers):
    tb = pl.program_id(1)
    bblk = pl.program_id(0)
    n_tb = pl.num_programs(1)

    @pl.when(tb == 0)
    def _():
        for scr in (dhf_scr, dcf_scr, dwf_scr, dwihf_scr, dbf_scr,
                    dhr_scr, dcr_scr, dwr_scr, dwihr_scr, dbr_scr,
                    daux_scr):
            scr[:] = jnp.zeros_like(scr)

    bb_b = aux_ref.shape[1]                           # aux_ref: (S, bbB, F)

    def one_direction(k, x_ref, b_ref, wih_ref, w_ref, hp_ref, cp_ref,
                      c_ref, dhs_ref, dx_ref, dh_scr, dc_scr, dw_scr,
                      dwih_scr, db_scr):
        x_t = x_ref[k]                                # (bbB, F)
        cond_x = jnp.concatenate(
            [x_t * aux_ref[i] for i in range(speakers)], axis=0)
        h_prev = hp_ref[k]
        c_prev = cp_ref[k].astype(jnp.float32)
        c_t = c_ref[k].astype(jnp.float32)

        gates = (jnp.dot(cond_x, wih_ref[:],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(h_prev, w_ref[:],
                           preferred_element_type=jnp.float32)
                 + b_ref[:].astype(jnp.float32))
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])

        dh = dh_scr[:] + dhs_ref[k]
        tanh_c = jnp.tanh(c_t)
        do = dh * tanh_c
        dc = dc_scr[:] + dh * o * (1 - tanh_c * tanh_c)
        di = dc * g
        df = dc * c_prev
        dg = dc * i
        dgates = jnp.concatenate([
            di * i * (1 - i),
            df * f * (1 - f),
            dg * (1 - g * g),
            do * o * (1 - o),
        ], axis=1)

        # d(conditioned rows) -> split into d(xs) and d(aux); all 2D
        # per-speaker static slices (s-major rows), no 3D broadcasts.
        dgm = _mm_cast(dgates, wih_ref)
        dcond = jnp.dot(dgm, wih_ref[:].T.astype(dgm.dtype),
                        preferred_element_type=jnp.float32)
        x32 = x_t.astype(jnp.float32)
        dx = None
        for i in range(speakers):
            dci = dcond[i * bb_b:(i + 1) * bb_b]      # (bbB, F)
            daux_scr[i] += dci * x32
            term = dci * aux_ref[i].astype(jnp.float32)
            dx = term if dx is None else dx + term
        dx_ref[k] = dx.astype(dx_ref.dtype)

        dwih_scr[:] += jnp.dot(cond_x.T.astype(dgm.dtype), dgm,
                               preferred_element_type=jnp.float32)
        db_scr[:] += jnp.sum(dgates, axis=0, keepdims=True)
        dw_scr[:] += jnp.dot(h_prev.T.astype(dgm.dtype), dgm,
                             preferred_element_type=jnp.float32)
        dh_scr[:] = jnp.dot(dgm, w_ref[:].T.astype(dgm.dtype),
                            preferred_element_type=jnp.float32)
        dc_scr[:] = dc * f

    def step(j, _):
        k = time_block - 1 - j
        one_direction(k, xs_ref, bf_ref, wihf_ref, wf_ref, hpf_ref,
                      cpf_ref, cf_ref, dhsf_ref, dxa_ref,
                      dhf_scr, dcf_scr, dwf_scr, dwihf_scr, dbf_scr)
        one_direction(k, xr_ref, br_ref, wihr_ref, wr_ref, hpr_ref,
                      cpr_ref, cr_ref, dhsr_ref, dxb_ref,
                      dhr_scr, dcr_scr, dwr_scr, dwihr_scr, dbr_scr)
        return 0

    jax.lax.fori_loop(0, time_block, step, 0)

    # daux is PER batch block: flush on this block's last time step.
    @pl.when(tb == n_tb - 1)
    def _():
        daux_ref[:] = daux_scr[:].astype(daux_ref.dtype)
        daux_scr[:] = jnp.zeros_like(daux_scr)

        # weight/bias grads are shared: later batch blocks add on top
        pairs = ((dwf_ref, dwf_scr), (dwr_ref, dwr_scr),
                 (dwihf_ref, dwihf_scr), (dwihr_ref, dwihr_scr),
                 (dbf_ref, dbf_scr), (dbr_ref, dbr_scr))

        @pl.when(bblk == 0)
        def _():
            for ref, scr in pairs:
                ref[:] = scr[:]

        @pl.when(bblk > 0)
        def _():
            for ref, scr in pairs:
                ref[:] += scr[:]

        for _, scr in pairs:
            scr[:] = jnp.zeros_like(scr)


def _ffc_batch_block(s):
    bb_b = max(1, BIDI_BATCH_BLOCK // s)
    return bb_b


def _ffc_prep(xs, aux, params):
    """xs (B, T, F), aux (B, S, F) -> padded time-major operands."""
    xt = jnp.swapaxes(xs, 0, 1).astype(STORAGE_DTYPE)   # (T, B, F)
    s = aux.shape[1]
    bb_b = min(_ffc_batch_block(s), xs.shape[0])
    xt, real_b = _pad_batch(xt, bb_b)
    # flip BEFORE time padding: the reverse direction must see the real
    # frames first; padding garbage lands at its tail and is sliced away
    xr = jnp.flip(xt, axis=0)
    xt, real_t = _pad_time_multiple(xt, TIME_BLOCK)
    xr, _ = _pad_time_multiple(xr, TIME_BLOCK)
    pad_b = xt.shape[1] - real_b
    # kernel layout: speaker-major (S, b_pad, F) so the kernel reads
    # per-speaker 2D slices
    aux_p = jnp.pad(aux, [(0, pad_b), (0, 0), (0, 0)]).astype(
        STORAGE_DTYPE).transpose(1, 0, 2)

    def w_of(suffix):
        wih = params['weight_ih_l0' + suffix].T.astype(STORAGE_DTYPE)
        b = (params['bias_ih_l0' + suffix]
             + params['bias_hh_l0' + suffix])[None].astype(jnp.float32)
        whh = params['weight_hh_l0' + suffix].T.astype(STORAGE_DTYPE)
        return wih, b, whh

    wihf, bf, wf = w_of('')
    wihr, br, wr = w_of('_reverse')
    return (xt, xr, aux_p, wihf, wihr, bf, br, wf, wr, real_b, real_t,
            bb_b)


def _ffc_fwd_impl(xt, xr, aux, wihf, wihr, bf, br, wf, wr, bb_b):
    seq_len, b_pad, feat = xt.shape
    s = aux.shape[0]                                  # aux: (S, b_pad, F)
    hidden = wf.shape[0]
    gh = 4 * hidden
    bb = bb_b * s
    nb = b_pad // bb_b
    k = TIME_BLOCK
    ntb = seq_len // k
    x_s = pl.BlockSpec((k, bb_b, feat), lambda i, t: (t, i, 0),
                       memory_space=pltpu.VMEM)
    aux_s = pl.BlockSpec((s, bb_b, feat), lambda i, t: (0, i, 0),
                         memory_space=pltpu.VMEM)
    wih_s = pl.BlockSpec((feat, gh), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM)
    b_s = pl.BlockSpec((1, gh), lambda i, t: (0, 0),
                       memory_space=pltpu.VMEM)
    w_s = pl.BlockSpec((hidden, gh), lambda i, t: (0, 0),
                       memory_space=pltpu.VMEM)
    h_s = pl.BlockSpec((k, bb, hidden), lambda i, t: (t, i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ffc_fwd_kernel, hidden=hidden, time_block=k,
                          speakers=s),
        grid=(nb, ntb),
        in_specs=[x_s, x_s, aux_s, wih_s, wih_s, b_s, b_s, w_s, w_s],
        out_specs=[h_s, h_s, h_s, h_s],
        out_shape=[jax.ShapeDtypeStruct((seq_len, b_pad * s, hidden),
                                        xt.dtype)] * 4,
        scratch_shapes=[pltpu.VMEM((bb, hidden), jnp.float32)] * 4,
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(xt, xr, aux, wihf, wihr, bf, br, wf, wr)


def _ffc_unfold(h, bb_b, s, real_b):
    """Kernel layout (T, b_pad*S, H) — rows s-major within each bb_b-row
    batch block — -> b-major (real_b*S, T, H) (row = b*S + s)."""
    t, rows, hid = h.shape
    nb = rows // (s * bb_b)
    h = h.reshape(t, nb, s, bb_b, hid)
    h = jnp.transpose(h, (1, 3, 2, 0, 4))               # (nb, bbB, S, T, H)
    return h.reshape(nb * bb_b * s, t, hid)[:real_b * s]


def _ffc_fold_grad(d, bb_b, s, b_pad, seq_len):
    """b-major (T, B*S, H) cotangent (real time) -> padded kernel layout
    (seq_len, b_pad*S, H), s-major within batch blocks, f32."""
    t, bs, hid = d.shape
    d = jnp.pad(d.astype(jnp.float32),
                [(0, seq_len - t), (0, b_pad * s - bs), (0, 0)])
    nb = b_pad // bb_b
    d = d.reshape(seq_len, nb, bb_b, s, hid)
    return jnp.transpose(d, (0, 1, 3, 2, 4)).reshape(
        seq_len, b_pad * s, hid)


def _ffc_out(hsf, hsr, B, S, real_t, dtype, bb_b):
    """Folded kernel-layout (T, B_pad*S, H) x 2 -> (B, S, T, 2H)."""
    f = _ffc_unfold(hsf[:real_t], bb_b, S, B)
    r = _ffc_unfold(jnp.flip(hsr[:real_t], axis=0), bb_b, S, B)
    out = jnp.concatenate([f, r], axis=-1).astype(dtype)  # (B*S, T, 2H)
    return out.reshape(B, S, out.shape[-2], out.shape[-1])


@jax.custom_vjp
def blstm_layer_fullfused_cond(params, xs, aux):
    """Bidirectional layer over 'mul'-conditioned input, fused end-to-end.

    xs: (B, T, F) pre-net features; aux: (B, S, F) embeddings.
    Returns (B, S, T, 2H) == blstm(xs[:, None] * aux[:, :, None]) without
    ever materializing the (B, S, T, F) conditioned tensor in HBM.
    """
    (xt, xr, aux_p, wihf, wihr, bf, br, wf, wr, real_b, real_t,
     bb_b) = _ffc_prep(xs, aux, params)
    hsf, hsr, _, _ = _ffc_fwd_impl(xt, xr, aux_p, wihf, wihr, bf, br,
                                   wf, wr, bb_b)
    return _ffc_out(hsf, hsr, xs.shape[0], aux.shape[1], real_t, xs.dtype,
                    bb_b)


def _ffc_layer_fwd(params, xs, aux):
    (xt, xr, aux_p, wihf, wihr, bf, br, wf, wr, real_b, real_t,
     bb_b) = _ffc_prep(xs, aux, params)
    hsf, hsr, csf, csr = _ffc_fwd_impl(xt, xr, aux_p, wihf, wihr, bf, br,
                                       wf, wr, bb_b)
    out = _ffc_out(hsf, hsr, xs.shape[0], aux.shape[1], real_t, xs.dtype,
                   bb_b)
    return out, (params, xs, aux, hsf, hsr, csf, csr, real_t, bb_b)


def _ffc_layer_bwd(residuals, dout):
    params, xs, aux, hsf, hsr, csf, csr, real_t, bb_b = residuals
    B, T, feat = xs.shape
    S = aux.shape[1]
    hidden = hsf.shape[-1]
    gh = 4 * hidden

    (xt, xr, aux_p, wihf, wihr, bf, br, wf, wr, _, _, _) = _ffc_prep(
        xs, aux, params)
    seq_len, b_pad = xt.shape[0], xt.shape[1]
    bb = bb_b * S

    # dout: (B, S, T, 2H) -> padded time-major kernel layout (s-major
    # within batch blocks) per direction; reverse is time-flipped BEFORE
    # the time padding (matching the xr convention).
    dfold = jnp.swapaxes(dout.reshape(B * S, T, 2 * hidden), 0, 1)
    dhsf = _ffc_fold_grad(dfold[..., :hidden], bb_b, S, b_pad, seq_len)
    dhsr = _ffc_fold_grad(jnp.flip(dfold[..., hidden:], axis=0),
                          bb_b, S, b_pad, seq_len)

    def prevs(hs, cs):
        zeros = jnp.zeros((1,) + hs.shape[1:], hs.dtype)
        return (jnp.concatenate([zeros, hs[:-1]], axis=0),
                jnp.concatenate([zeros, cs[:-1]], axis=0))

    hpf, cpf = prevs(hsf, csf)
    hpr, cpr = prevs(hsr, csr)

    nb = b_pad // bb_b
    k = TIME_BLOCK
    ntb = seq_len // k
    rev = lambda i, t: ((ntb - 1 - t), i, 0)  # noqa: E731
    x_s = pl.BlockSpec((k, bb_b, feat), rev, memory_space=pltpu.VMEM)
    aux_s = pl.BlockSpec((S, bb_b, feat), lambda i, t: (0, i, 0),
                         memory_space=pltpu.VMEM)
    wih_s = pl.BlockSpec((feat, gh), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM)
    b_s = pl.BlockSpec((1, gh), lambda i, t: (0, 0),
                       memory_space=pltpu.VMEM)
    w_s = pl.BlockSpec((hidden, gh), lambda i, t: (0, 0),
                       memory_space=pltpu.VMEM)
    h_s = pl.BlockSpec((k, bb, hidden), rev, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_ffc_bwd_kernel, hidden=hidden, time_block=k,
                          speakers=S),
        grid=(nb, ntb),
        in_specs=[x_s, x_s, aux_s, wih_s, wih_s, b_s, b_s, w_s, w_s,
                  h_s, h_s, h_s, h_s,
                  h_s, h_s, h_s, h_s],
        out_specs=[x_s, x_s, aux_s, wih_s, wih_s, b_s, b_s, w_s, w_s],
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, b_pad, feat), jnp.float32),
            jax.ShapeDtypeStruct((seq_len, b_pad, feat), jnp.float32),
            jax.ShapeDtypeStruct((S, b_pad, feat), jnp.float32),
            jax.ShapeDtypeStruct((feat, gh), jnp.float32),
            jax.ShapeDtypeStruct((feat, gh), jnp.float32),
            jax.ShapeDtypeStruct((1, gh), jnp.float32),
            jax.ShapeDtypeStruct((1, gh), jnp.float32),
            jax.ShapeDtypeStruct((hidden, gh), jnp.float32),
            jax.ShapeDtypeStruct((hidden, gh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((hidden, gh), jnp.float32),
            pltpu.VMEM((feat, gh), jnp.float32),
            pltpu.VMEM((1, gh), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((bb, hidden), jnp.float32),
            pltpu.VMEM((hidden, gh), jnp.float32),
            pltpu.VMEM((feat, gh), jnp.float32),
            pltpu.VMEM((1, gh), jnp.float32),
            pltpu.VMEM((S, bb_b, feat), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=INTERPRET,
    )(xt, xr, aux_p, wihf, wihr, bf, br, wf, wr,
      hpf, cpf, csf, dhsf, hpr, cpr, csr, dhsr)
    dxa, dxb, daux, dwihf, dwihr, dbf, dbr, dwhf, dwhr = outs

    dxa = dxa[:real_t, :B]
    dxb = jnp.flip(dxb[:real_t], axis=0)[:, :B]
    dx = jnp.swapaxes((dxa + dxb).astype(xs.dtype), 0, 1)
    daux = jnp.swapaxes(daux, 0, 1)[:B].astype(aux.dtype)

    d_params = {}
    for suffix, dwih, db, dwhh in (('', dwihf, dbf, dwhf),
                                   ('_reverse', dwihr, dbr, dwhr)):
        d_params['weight_ih_l0' + suffix] = dwih.T
        d_params['bias_ih_l0' + suffix] = db[0]
        d_params['bias_hh_l0' + suffix] = db[0]
        d_params['weight_hh_l0' + suffix] = dwhh.T
    return d_params, dx, daux


blstm_layer_fullfused_cond.defvjp(_ffc_layer_fwd, _ffc_layer_bwd)
