"""Bidirectional LSTM with projection (RNNP), TPU-first.

Functional equivalent of the reference's ESPnet-derived ``RNNP_packed``
(``tssep/train/rnnp.py:12-173``): ``[BLSTM -> Linear -> (Dropout -> Tanh)] x
elayers`` with the nonlinearity dropped after the last layer, and rank-2/3/4
inputs (speakers folded into the batch axis).

TPU design (this is the throughput-critical recurrence):

- The input projection ``x @ W_ih^T + b`` for *all* timesteps is hoisted out
  of the recurrence into one large MXU matmul ``(B*T, I) x (I, 4H)``.
- The ``lax.scan`` body then only does the ``(B, H) x (H, 4H)`` hidden
  matmul + gate nonlinearities per step — the minimal serial work.
- Bidirectionality = two scans over a time-flipped input-projection tensor.
- Weights are stored in torch layout (``w_ih: (4H, I)``, gate order
  i,f,g,o) so parameter counts and checkpoint-transform semantics match the
  reference's goldens (e.g. 10,745,565 params for the ts_vad=4 model,
  reference ``net.py:457-483``).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from tssep_tpu.nn.init import (torch_gru_init, torch_linear_init,
                               torch_lstm_init)

__all__ = ['RNNP', 'lstm_init', 'gru_init', 'blstm_apply', 'bgru_apply']

#: Steps per scan iteration: amortizes per-step loop overhead into larger
#: fused blocks (XLA). Tunable via env for benchmarking.
DEFAULT_UNROLL = int(os.environ.get('TSSEP_LSTM_UNROLL', '8'))

#: Rematerialize BLSTM layers in the backward pass (recompute instead of
#: saving all per-step activations). Costs ~1 extra forward, saves O(T*B*4H)
#: HBM per layer — enables much larger batches (HBM is the binding
#: constraint; see jax.checkpoint docs).
DEFAULT_REMAT = os.environ.get('TSSEP_LSTM_REMAT', '1') != '0'


def lstm_init(key, input_size: int, hidden_size: int, bidirectional=True):
    """Init one (B)LSTM layer's params (torch layout and naming)."""
    keys = jax.random.split(key, 2)
    out = torch_lstm_init(keys[0], input_size, hidden_size)
    if bidirectional:
        rev = torch_lstm_init(keys[1], input_size, hidden_size)
        out.update({k + '_reverse': v for k, v in rev.items()})
    return out


def gru_init(key, input_size: int, hidden_size: int, bidirectional=True):
    """Init one (B)GRU layer's params (torch layout and naming).

    Reference dispatches ``torch.nn.LSTM if 'lstm' in typ else
    torch.nn.GRU`` (``tssep/train/rnnp.py:87``); this is the GRU arm."""
    keys = jax.random.split(key, 2)
    out = torch_gru_init(keys[0], input_size, hidden_size)
    if bidirectional:
        rev = torch_gru_init(keys[1], input_size, hidden_size)
        out.update({k + '_reverse': v for k, v in rev.items()})
    return out


def _gru_scan(xg, hg_bias, w_hh, h0, reverse: bool):
    """Scan a GRU over time (torch gate order r, z, n).

    xg: (T, B, 3H) precomputed input projections + input bias.
    hg_bias: (3H,) the hidden bias — kept OUT of xg because the n-gate's
    hidden term is gated by r *including its bias*:
    ``n = tanh(x_n + b_in + r * (W_hn h + b_hn))``.
    """
    H = w_hh.shape[1]
    w_hh_t = w_hh.T  # (H, 3H)

    def step(h, xg_t):
        hg = h @ w_hh_t + hg_bias
        r = jax.nn.sigmoid(xg_t[..., :H] + hg[..., :H])
        z = jax.nn.sigmoid(xg_t[..., H:2 * H] + hg[..., H:2 * H])
        n = jnp.tanh(xg_t[..., 2 * H:] + r * hg[..., 2 * H:])
        h = (1 - z) * n + z * h
        return h, h

    _, ys = jax.lax.scan(step, h0, xg, reverse=reverse,
                         unroll=DEFAULT_UNROLL)
    return ys


def _bgru_apply_impl(params, x, hidden_size: int, bidirectional: bool):
    B, T, _ = x.shape
    H = hidden_size

    def direction(suffix, reverse):
        w_ih = params['weight_ih_l0' + suffix].astype(x.dtype)
        w_hh = params['weight_hh_l0' + suffix].astype(x.dtype)
        b_i = params['bias_ih_l0' + suffix].astype(x.dtype)
        b_h = params['bias_hh_l0' + suffix].astype(x.dtype)
        xg = x @ w_ih.T + b_i                    # (B, T, 3H)
        xg = jnp.swapaxes(xg, 0, 1)              # time-major for scan
        h0 = jnp.zeros((B, H), dtype=x.dtype)
        ys = _gru_scan(xg, b_h, w_hh, h0, reverse)
        return jnp.swapaxes(ys, 0, 1)            # (B, T, H)

    out = direction('', False)
    if bidirectional:
        out = jnp.concatenate([out, direction('_reverse', True)], axis=-1)
    return out


_bgru_apply_remat = jax.checkpoint(_bgru_apply_impl, static_argnums=(2, 3))


def bgru_apply(params, x, *, hidden_size: int, bidirectional=True,
               remat=None):
    """Apply one (bidirectional) GRU layer: (B, T, I) -> (B, T, 2H).

    Scan path only (the Pallas kernel family is LSTM-specific; nothing in
    the reference recipes trains GRUs, so the fused-kernel investment
    goes to the LSTM)."""
    if remat is None:
        remat = DEFAULT_REMAT
    fn = _bgru_apply_remat if remat else _bgru_apply_impl
    return fn(params, x, hidden_size, bidirectional)


def _lstm_scan(xg, w_hh, h0, c0, reverse: bool, return_state=False):
    """Scan an LSTM over time.

    xg: (T, B, 4H) precomputed input projections (+ both biases).
    Returns outputs (T, B, H), or ``(outputs, (h_T, c_T))`` with
    ``return_state`` (the final carry — streaming state passing).
    """
    H = w_hh.shape[1]
    w_hh_t = w_hh.T  # (H, 4H)

    def step(carry, xg_t):
        h, c = carry
        gates = xg_t + h @ w_hh_t
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    final, ys = jax.lax.scan(step, (h0, c0), xg, reverse=reverse,
                             unroll=DEFAULT_UNROLL)
    if return_state:
        return ys, final
    return ys


def _blstm_apply_impl(params, x, hidden_size: int, bidirectional: bool):
    B, T, _ = x.shape
    H = hidden_size

    def direction(suffix, reverse):
        w_ih = params['weight_ih_l0' + suffix].astype(x.dtype)
        # cast w_hh too: a f32 w_hh under bf16 activations would promote
        # the scan carry to f32 and break the carry-type invariant
        w_hh = params['weight_hh_l0' + suffix].astype(x.dtype)
        b = (params['bias_ih_l0' + suffix]
             + params['bias_hh_l0' + suffix]).astype(x.dtype)
        xg = x @ w_ih.T + b                      # (B, T, 4H) — one MXU matmul
        xg = jnp.swapaxes(xg, 0, 1)              # time-major for scan
        h0 = jnp.zeros((B, H), dtype=x.dtype)
        c0 = jnp.zeros((B, H), dtype=x.dtype)
        ys = _lstm_scan(xg, w_hh, h0, c0, reverse)
        return jnp.swapaxes(ys, 0, 1)            # (B, T, H)

    out = direction('', False)
    if bidirectional:
        out = jnp.concatenate([out, direction('_reverse', True)], axis=-1)
    return out


_blstm_apply_remat = jax.checkpoint(_blstm_apply_impl,
                                    static_argnums=(2, 3))


#: Recurrence backend: 'scan' (lax.scan + unroll), 'pallas' (fused VMEM
#: cell kernel with custom VJP, tssep_tpu/kernels/blstm.py), or 'auto'
#: (pallas on TPU — measured ~2x the scan path — scan elsewhere).
DEFAULT_IMPL = os.environ.get('TSSEP_LSTM_IMPL', 'auto')

_auto_impl_cache = None

#: Session-wide override (e.g. the Trainer fences the Pallas backend to
#: 'scan' under a model-parallel mesh: the fused kernel is written for
#: unsharded/batch-local operands, while XLA's SPMD partitioner handles the
#: gate-dim-sharded matmuls of the scan path natively).
_FORCED_IMPL = None


def force_impl(impl):
    """Force the recurrence backend ('scan'/'pallas'); ``None`` clears."""
    global _FORCED_IMPL
    assert impl in (None, 'scan', 'pallas'), impl
    _FORCED_IMPL = impl


def _resolve_impl(impl):
    global _auto_impl_cache
    if _FORCED_IMPL is not None:
        return _FORCED_IMPL
    if impl != 'auto':
        return impl
    if _auto_impl_cache is None:
        _auto_impl_cache = (
            'pallas' if jax.default_backend() not in ('cpu', 'gpu')
            else 'scan')
    return _auto_impl_cache


def _blstm_pallas(params, x, hidden_size, bidirectional):
    from tssep_tpu.kernels.blstm import blstm_apply_fused
    return blstm_apply_fused(params, x, hidden_size=hidden_size,
                             bidirectional=bidirectional)


_blstm_pallas_remat = jax.checkpoint(_blstm_pallas, static_argnums=(2, 3))


def _blstm_fullfused(params, x, hidden_size, bidirectional):
    from tssep_tpu.kernels.blstm import blstm_layer_fullfused
    return blstm_layer_fullfused(params, x)


def _blstm_spill(params, x, hidden_size, bidirectional):
    from tssep_tpu.kernels.blstm import blstm_layer_fullfused_spill
    return blstm_layer_fullfused_spill(params, x)


#: Remat'd spill layer: residual = x only; the backward re-runs the spill
#: forward (cheaper than the fullfused forward — no cs writes) and then the
#: restructured spill backward.  Used for the layers whose (x, dx, hs)
#: working set is too fat to keep live (the 513-wide first folded layer at
#: flagship batch 256: chip-measured 155 MB over HBM with no remat at all).
_blstm_spill_remat = jax.checkpoint(_blstm_spill, static_argnums=(2, 3))


#: Remat'd fully-fused layer: without this, every folded (B*S) layer keeps
#: its hs/cs residuals (~1.5 GB bf16 at flagship dims) alive until its
#: backward runs — chip-measured HBM OOM at batch 256.  Under checkpoint
#: the backward re-runs the (cheap, xg-free) fused forward instead, so the
#: residuals are transient per layer.
_blstm_fullfused_remat = jax.checkpoint(_blstm_fullfused,
                                        static_argnums=(2, 3))

#: Layer-level custom VJP for the bidirectional Pallas path: backward
#: recomputes only the input projections (one parallel matmul) instead of
#: remat's full forward recurrence re-run — no-remat speed at near-remat
#: memory (residuals: x + the state sequences the kernel saves anyway).
#: Opt-in until chip-verified (tools/check_bidi.py, LAYER VJP section).
LAYER_VJP = os.environ.get('TSSEP_PALLAS_LAYER_VJP', '0') != '0'

#: Conditioned fully-fused first post-net layer: form (xs * aux) in kernel
#: VMEM instead of materializing the (B, S, T, F) tensor in HBM
#: (kernels/blstm.py ``blstm_layer_fullfused_cond``).  Opt-in pending chip
#: verification, like FULLFUSE.
CONDFUSE = os.environ.get('TSSEP_PALLAS_CONDFUSE', '0') != '0'


def cond_fuse_active(impl=None):
    """True when the conditioned fused first-layer kernel should be used."""
    return CONDFUSE and _resolve_impl(impl or DEFAULT_IMPL) == 'pallas'

#: Fully-fused layer: the input projections run INSIDE the recurrence
#: kernel (no xg tensors in HBM at all).  Chip-verified round 3
#: (tools/check_bidi.py numerics; bench: 2215 vs 2052 audio-s/s for the
#: interleaved-bidi path at the flagship config) — DEFAULT ON.
FULLFUSE = os.environ.get('TSSEP_PALLAS_FULLFUSE', '1') != '0'

#: Widest input feature dim the fully-fused kernel accepts.  The backward
#: kernel keeps W_ih (I, 4H) plus an f32 dW_ih accumulator per direction
#: resident in VMEM; for the ts_vad stacked layer (I = S*projs = 2560 on
#: the flagship) that stack exceeds the chip's scoped-vmem limit (measured
#: 102.3M vs the 100M default on v5e).  Layers wider than the cap fall
#: back to the layer-VJP / interleaved-bidi path, whose xg for the fat
#: stacked layer is small (it has batch B, not B*S).
FULLFUSE_MAX_INPUT = int(os.environ.get('TSSEP_PALLAS_FULLFUSE_MAX_INPUT',
                                        '2048'))

#: Block-spilled fully-fused layer (kernels/blstm.py
#: ``blstm_layer_fullfused_spill``): residuals are hs + per-SPILL_BLOCK
#: c boundaries instead of the full hs/cs sequences — no-remat
#: backward speed (restructured: the only serial matmul is the dh
#: backprop) at BELOW-remat-default memory, for EVERY fullfuse-eligible
#: layer at once.  When on, it replaces both the remat and the
#: NO_REMAT_FOLDED strategies for those layers (the caller's remat flag
#: is ignored unless TSSEP_PALLAS_SPILL_REMAT=1: re-running the forward
#: is exactly what the spilled residuals make unnecessary).  Opt-in
#: pending chip verification (tools/check_bidi.py SPILL section).
SPILL = os.environ.get('TSSEP_PALLAS_SPILL', '0') != '0'
SPILL_REMAT = os.environ.get('TSSEP_PALLAS_SPILL_REMAT', '0') != '0'

#: Number of FOLDED (B*S-batch) post-net layers to run WITHOUT remat,
#: counted from the last folded layer backwards — each one trades
#: ~1.5 GB HBM (hs/cs residuals at flagship dims) for skipping the remat
#: forward re-run (~27 ms/layer chip-measured).  0 = remat everything.
#: Default 2: chip-benched 2314 vs 2215 audio-s/s at the flagship
#: config (batch 256 fits: residuals +3.1 GB).
NO_REMAT_FOLDED = int(os.environ.get('TSSEP_NO_REMAT_FOLDED', '2'))


def blstm_apply(params, x, *, hidden_size: int, bidirectional=True,
                remat=None, impl=None):
    """Apply one (bidirectional) LSTM layer.

    x: (B, T, I) -> (B, T, 2H) (or (B, T, H) unidirectional).
    """
    if remat is None:
        remat = DEFAULT_REMAT
    if impl is None:
        impl = DEFAULT_IMPL
    impl = _resolve_impl(impl)
    if impl == 'pallas':
        if (bidirectional and FULLFUSE
                and x.shape[-1] <= FULLFUSE_MAX_INPUT):
            if SPILL:
                fn = (_blstm_spill_remat if (remat and SPILL_REMAT)
                      else _blstm_spill)
            else:
                fn = _blstm_fullfused_remat if remat else _blstm_fullfused
            return fn(params, x, hidden_size, bidirectional)
        if bidirectional and (LAYER_VJP or FULLFUSE):
            # Wide layers (> FULLFUSE_MAX_INPUT, i.e. the ts_vad stacked
            # layer with batch B, not B*S): projection-recompute VJP
            # without remat — its residuals are cheap at batch B and the
            # backward skips the forward re-run entirely.
            from tssep_tpu.kernels import blstm as _kb
            if _kb.BIDI:
                return _kb.blstm_layer_fused(params, x)
        fn = _blstm_pallas_remat if remat else _blstm_pallas
    else:
        fn = _blstm_apply_remat if remat else _blstm_apply_impl
    return fn(params, x, hidden_size, bidirectional)


@dataclasses.dataclass(frozen=True)
class RNNP:
    """RNN-with-projection block: [BLSTM -> Linear (-> Dropout -> Tanh)] x elayers."""

    idim: int
    elayers: int = 1
    cdim: int = 300
    hdim: int = 320
    dropout: float = 0.0
    typ: str = 'blstm'

    @property
    def bidirectional(self):
        return self.typ.startswith('b')

    @property
    def cell(self):
        """'lstm' or 'gru' — reference ``rnnp.py:87`` dispatches
        ``torch.nn.LSTM if 'lstm' in typ else torch.nn.GRU``."""
        return 'lstm' if 'lstm' in self.typ else 'gru'

    def init(self, key):
        params = {}
        keys = jax.random.split(key, 2 * self.elayers)
        scale = 2 if self.bidirectional else 1
        cell_init = lstm_init if self.cell == 'lstm' else gru_init
        for i in range(self.elayers):
            inputdim = self.idim if i == 0 else self.hdim
            params[f'lstm{i}'] = cell_init(
                keys[2 * i], inputdim, self.cdim, self.bidirectional)
            params[f'proj{i}'] = torch_linear_init(
                keys[2 * i + 1], scale * self.cdim, self.hdim)
        return params

    def apply(self, params, x, *, rng=None, training=False, remat=None):
        """x: (..., T, idim) with rank 2, 3 or 4 (batch [, speaker], time, feat)."""
        rank = x.ndim
        lead = x.shape[:-2]
        if rank == 2:
            h = x[None]
        elif rank == 3:
            h = x
        elif rank == 4:
            h = x.reshape((-1,) + x.shape[2:])   # fold (batch, spk)
        else:
            raise ValueError(x.shape)

        for i in range(self.elayers):
            if self.cell == 'gru':
                h = bgru_apply(params[f'lstm{i}'], h, hidden_size=self.cdim,
                               bidirectional=self.bidirectional, remat=remat)
            else:
                h = blstm_apply(params[f'lstm{i}'], h, hidden_size=self.cdim,
                                bidirectional=self.bidirectional, remat=remat)
            p = params[f'proj{i}']
            h = h @ p['weight'].T.astype(h.dtype) + p['bias'].astype(h.dtype)
            if i < self.elayers - 1:
                if training and self.dropout > 0 and rng is not None:
                    rng, sub = jax.random.split(rng)
                    keep = jax.random.bernoulli(sub, 1 - self.dropout, h.shape)
                    h = jnp.where(keep, h / (1 - self.dropout), 0)
                h = jnp.tanh(h)

        if rank == 2:
            return h[0]
        if rank == 4:
            return h.reshape(lead + h.shape[1:])
        return h

    def apply_conditioned(self, params, xs, aux, *, rng=None,
                          training=False):
        """Fused 'mul'-conditioned layer: equivalent to
        ``apply(params, xs[:, None] * aux[:, :, None])`` but the
        (B, S, T, F) conditioned tensor is formed block-wise in kernel
        VMEM, never in HBM.  xs: (B, T, F); aux: (B, S, F) ->
        (B, S, T, hdim).  Requires elayers == 1, bidirectional."""
        assert self.elayers == 1 and self.bidirectional, (
            self.elayers, self.typ)
        from tssep_tpu.kernels import blstm as _kb
        fn = _kb.blstm_layer_fullfused_cond
        if DEFAULT_REMAT:
            # without remat the layer's hs/cs residuals (~1.5 GB bf16 at
            # flagship dims) stay live until its backward — chip-measured
            # HBM OOM; checkpoint re-runs the cheap fused forward instead
            fn = jax.checkpoint(fn)
        h = fn(params['lstm0'], xs, aux)
        p = params['proj0']
        return h @ p['weight'].T.astype(h.dtype) + p['bias'].astype(h.dtype)

    def num_params(self):
        scale = 2 if self.bidirectional else 1
        gates = 4 if self.cell == 'lstm' else 3
        n = 0
        for i in range(self.elayers):
            inputdim = self.idim if i == 0 else self.hdim
            n += scale * (gates * self.cdim * (inputdim + self.cdim)
                          + 2 * gates * self.cdim)
            n += self.hdim * (scale * self.cdim) + self.hdim
        return n
