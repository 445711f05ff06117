"""Pallas kernel logic tests via the interpreter (CPU-runnable).

The fused LSTM kernels normally require TPU hardware; with
``TSSEP_PALLAS_INTERPRET=1`` (set here before import) `pallas_call` runs
through the Pallas interpreter, so the kernel bodies — grid walking,
scratch carries, custom VJPs — are validated in CI against the scan path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tssep_tpu.nn import rnnp
from tssep_tpu.nn.init import torch_lstm_init


@pytest.fixture(scope='module')
def kb():
    """The kernels module with interpret mode + tiny blocking, restored on
    teardown (module GLOBALS are patched, not the env: the constants are
    read at import time, so env mutation would be order-dependent across
    the test session and leak into other tests)."""
    from tssep_tpu.kernels import blstm
    saved = (blstm.INTERPRET, blstm.BATCH_BLOCK, blstm.BIDI_BATCH_BLOCK,
             blstm.TIME_BLOCK)
    blstm.INTERPRET = True
    blstm.BATCH_BLOCK = 8
    blstm.BIDI_BATCH_BLOCK = 8
    blstm.TIME_BLOCK = 4
    yield blstm
    (blstm.INTERPRET, blstm.BATCH_BLOCK, blstm.BIDI_BATCH_BLOCK,
     blstm.TIME_BLOCK) = saved


@pytest.fixture(scope='module')
def data():
    B, T, I, H = 16, 23, 12, 16   # odd T exercises time padding
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, I), jnp.float32)
    params = torch_lstm_init(jax.random.PRNGKey(1), I, H)
    params.update({k + '_reverse': v for k, v in
                   torch_lstm_init(jax.random.PRNGKey(2), I, H).items()})
    return x, params, H


def _scan_ref(params, x, H):
    return rnnp._blstm_apply_impl(params, x, H, True)


def test_unidirectional_kernel_matches_scan(kb, data):
    x, params, H = data
    ref = rnnp._blstm_apply_impl(params, x, H, False)
    got = kb.blstm_apply_fused(params, x, hidden_size=H,
                               bidirectional=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_bidi_kernel_matches_scan(kb, data):
    x, params, H = data
    ref = _scan_ref(params, x, H)
    got = kb.blstm_apply_fused_bidi(params, x, hidden_size=H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_bidi_kernel_grads_match_scan(kb, data):
    x, params, H = data

    def loss_ref(p, x):
        return jnp.sum(_scan_ref(p, x, H) ** 2)

    def loss_bidi(p, x):
        return jnp.sum(kb.blstm_apply_fused_bidi(
            p, x, hidden_size=H) ** 2)

    g_ref = jax.grad(loss_ref)(params, x)
    g_bidi = jax.grad(loss_bidi)(params, x)
    for k in sorted(g_ref):
        a, b = np.asarray(g_ref[k]), np.asarray(g_bidi[k])
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert err < 1e-4, (k, err)
    gx_ref = jax.grad(loss_ref, argnums=1)(params, x)
    gx_bidi = jax.grad(loss_bidi, argnums=1)(params, x)
    np.testing.assert_allclose(np.asarray(gx_bidi), np.asarray(gx_ref),
                               atol=1e-4)


@pytest.mark.slow
def test_layer_vjp_matches_scan(kb, data):
    """The projection-recompute layer VJP: fwd + all grads vs scan."""
    x, params, H = data
    ref = _scan_ref(params, x, H)
    got = kb.blstm_layer_fused(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def loss_ref(p, x):
        return jnp.sum(_scan_ref(p, x, H) ** 2)

    def loss_lay(p, x):
        return jnp.sum(kb.blstm_layer_fused(p, x) ** 2)

    g_ref = jax.grad(loss_ref)(params, x)
    g_lay = jax.grad(loss_lay)(params, x)
    for k in sorted(g_ref):
        a, b = np.asarray(g_ref[k]), np.asarray(g_lay[k])
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert err < 1e-4, (k, err)
    gx_ref = jax.grad(loss_ref, argnums=1)(params, x)
    gx_lay = jax.grad(loss_lay, argnums=1)(params, x)
    np.testing.assert_allclose(np.asarray(gx_lay), np.asarray(gx_ref),
                               atol=1e-4)


def test_kernel_handles_batch_padding(kb, data):
    """Batch not a multiple of the block: padded and un-padded correctly."""
    x, params, H = data
    x_small = x[:5]                   # 5 % 8 != 0
    ref = _scan_ref(params, x_small, H)
    got = kb.blstm_apply_fused_bidi(params, x_small, hidden_size=H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fullfused_matches_scan(kb, data):
    """In-kernel input projection layer: fwd parity with scan."""
    x, params, H = data
    ref = _scan_ref(params, x, H)
    got = kb.blstm_layer_fullfused(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fullfused_grads_match_scan(kb, data):
    x, params, H = data

    def loss_ref(p, x):
        return jnp.sum(_scan_ref(p, x, H) ** 2)

    def loss_ff(p, x):
        return jnp.sum(kb.blstm_layer_fullfused(p, x) ** 2)

    g_ref = jax.grad(loss_ref)(params, x)
    g_ff = jax.grad(loss_ff)(params, x)
    for k in sorted(g_ref):
        a, b = np.asarray(g_ref[k]), np.asarray(g_ff[k])
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert err < 1e-4, (k, err)
    gx_ref = jax.grad(loss_ref, argnums=1)(params, x)
    gx_ff = jax.grad(loss_ff, argnums=1)(params, x)
    np.testing.assert_allclose(np.asarray(gx_ff), np.asarray(gx_ref),
                               atol=1e-4)


def test_fullfused_batch_padding(kb, data):
    x, params, H = data
    x_small = x[:5]
    ref = _scan_ref(params, x_small, H)
    got = kb.blstm_layer_fullfused(params, x_small)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fullfused_no_time_padding(kb, data):
    """T an exact TIME_BLOCK multiple: the pad_t == 0 static branch of the
    in-kernel-reversal kernels (no state reset select emitted)."""
    x, params, H = data
    x_even = x[:, :20]                # 20 % 4 == 0
    ref = _scan_ref(params, x_even, H)
    got = kb.blstm_layer_fullfused(params, x_even)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def loss_ref(p):
        return jnp.sum(_scan_ref(p, x_even, H) ** 2)

    def loss_ff(p):
        return jnp.sum(kb.blstm_layer_fullfused(p, x_even) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_ff = jax.grad(loss_ff)(params)
    for k in sorted(g_ref):
        a, b = np.asarray(g_ref[k]), np.asarray(g_ff[k])
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert err < 1e-4, (k, err)


# ---------------------------------------------------------------------------
# Block-spilled fully-fused layer (boundary-state residuals)
# ---------------------------------------------------------------------------

def test_fullfused_spill_matches_scan(kb, data):
    """Spill-variant forward parity (also exercises boundary outputs and
    time padding to the SPILL_BLOCK multiple: T=23 -> 24)."""
    x, params, H = data
    ref = _scan_ref(params, x, H)
    got = kb.blstm_layer_fullfused_spill(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fullfused_spill_grads_match_scan(kb, data):
    """The restructured backward (batched gate recompute + in-VMEM cell
    reconstruction from spilled boundaries) matches scan gradients."""
    x, params, H = data

    def loss_ref(p, x):
        return jnp.sum(_scan_ref(p, x, H) ** 2)

    def loss_sp(p, x):
        return jnp.sum(kb.blstm_layer_fullfused_spill(p, x) ** 2)

    g_ref = jax.grad(loss_ref)(params, x)
    g_sp = jax.grad(loss_sp)(params, x)
    for k in sorted(g_ref):
        a, b = np.asarray(g_ref[k]), np.asarray(g_sp[k])
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert err < 1e-4, (k, err)
    gx_ref = jax.grad(loss_ref, argnums=1)(params, x)
    gx_sp = jax.grad(loss_sp, argnums=1)(params, x)
    np.testing.assert_allclose(np.asarray(gx_sp), np.asarray(gx_ref),
                               atol=1e-4)


def test_fullfused_spill_batch_padding(kb, data):
    x, params, H = data
    x_small = x[:5]
    ref = _scan_ref(params, x_small, H)
    got = kb.blstm_layer_fullfused_spill(params, x_small)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_fullfused_bf16_storage_grads(kb, data):
    """The bf16 streaming policy (storage-dtype dx outputs + dhs inputs,
    round 4) stays within bf16 quantization of the f32 scan gradients —
    the production bench runs this configuration."""
    x, params, H = data
    saved = kb.STORAGE_DTYPE
    kb.STORAGE_DTYPE = jnp.bfloat16
    try:
        def loss_ff(p, x):
            return jnp.sum(kb.blstm_layer_fullfused(p, x) ** 2)

        def loss_ref(p, x):
            return jnp.sum(_scan_ref(p, x, H) ** 2)

        g_ff = jax.grad(loss_ff)(params, x)
        gx_ff = jax.grad(loss_ff, argnums=1)(params, x)
        g_ref = jax.grad(loss_ref)(params, x)
        gx_ref = jax.grad(loss_ref, argnums=1)(params, x)
        for k in sorted(g_ref):
            a, b = np.asarray(g_ref[k]), np.asarray(g_ff[k])
            err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
            assert err < 3e-2, (k, err)   # bf16 eps ~ 8e-3
        rel = (np.max(np.abs(np.asarray(gx_ff) - np.asarray(gx_ref)))
               / (np.max(np.abs(np.asarray(gx_ref))) + 1e-9))
        assert rel < 3e-2, rel
    finally:
        kb.STORAGE_DTYPE = saved


def test_spill_bwd_bb_vmem_model():
    """The backward batch-block model reproduces the chip measurement:
    bb=256 at feat=513/H=300 allocates 104.81M against the 100M scoped
    limit (so 513 drops to 128) while the 320-wide layers keep 256.

    Pins BIDI_BATCH_BLOCK to the production 256 for the duration (the
    module-scoped ``kb`` fixture may have shrunk it to 8)."""
    from tssep_tpu.kernels import blstm as kb_real
    saved = kb_real.BIDI_BATCH_BLOCK
    kb_real.BIDI_BATCH_BLOCK = 256
    try:
        assert kb_real._spill_bwd_bb(513, 300, 2048) == 128
        assert kb_real._spill_bwd_bb(320, 300, 2048) == 256
        # small problems keep the full (padded) batch
        assert kb_real._spill_bwd_bb(16, 8, 8) == 8
    finally:
        kb_real.BIDI_BATCH_BLOCK = saved


def test_fullfused_spill_multi_block_grads(kb, data):
    """Sequence long enough for several spill blocks AND several time
    blocks per spill block (dh/dc carries must flow across both)."""
    x, params, H = data
    x_long = jnp.concatenate([x, x[:, ::-1], x], axis=1)  # T = 69 -> 72

    def loss_ref(p):
        return jnp.sum(_scan_ref(p, x_long, H) ** 2)

    def loss_sp(p):
        return jnp.sum(kb.blstm_layer_fullfused_spill(p, x_long) ** 2)

    np.testing.assert_allclose(float(loss_sp(params)),
                               float(loss_ref(params)), rtol=1e-5)
    g_ref = jax.grad(loss_ref)(params)
    g_sp = jax.grad(loss_sp)(params)
    for k in sorted(g_ref):
        a, b = np.asarray(g_ref[k]), np.asarray(g_sp[k])
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert err < 1e-4, (k, err)


# ---------------------------------------------------------------------------
# Conditioned fully-fused layer ((xs * aux) formed in VMEM)
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def cond_data():
    B, S, T, F, H = 3, 4, 23, 12, 16
    xs = jax.random.normal(jax.random.PRNGKey(3), (B, T, F), jnp.float32)
    aux = jax.random.normal(jax.random.PRNGKey(4), (B, S, F), jnp.float32)
    params = torch_lstm_init(jax.random.PRNGKey(5), F, H)
    params.update({k + '_reverse': v for k, v in
                   torch_lstm_init(jax.random.PRNGKey(6), F, H).items()})
    return xs, aux, params, H


def _cond_ref(params, xs, aux, H):
    """Reference: materialize the conditioned tensor, fold, scan."""
    B, S = aux.shape[0], aux.shape[1]
    h = xs[:, None, :, :] * aux[:, :, None, :]
    h = h.reshape((B * S,) + h.shape[2:])
    out = rnnp._blstm_apply_impl(params, h, H, True)
    return out.reshape((B, S) + out.shape[1:])


def test_fullfused_cond_matches_materialized(kb, cond_data):
    xs, aux, params, H = cond_data
    ref = _cond_ref(params, xs, aux, H)
    got = kb.blstm_layer_fullfused_cond(params, xs, aux)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fullfused_cond_grads_match(kb, cond_data):
    xs, aux, params, H = cond_data

    def loss_ref(p, xs, aux):
        return jnp.sum(_cond_ref(p, xs, aux, H) ** 2)

    def loss_ffc(p, xs, aux):
        return jnp.sum(kb.blstm_layer_fullfused_cond(p, xs, aux) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, xs, aux)
    g_ffc = jax.grad(loss_ffc, argnums=(0, 1, 2))(params, xs, aux)
    for k in sorted(g_ref[0]):
        a, b = np.asarray(g_ref[0][k]), np.asarray(g_ffc[0][k])
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert err < 1e-4, (k, err)
    np.testing.assert_allclose(np.asarray(g_ffc[1]), np.asarray(g_ref[1]),
                               atol=1e-4)  # d xs
    np.testing.assert_allclose(np.asarray(g_ffc[2]), np.asarray(g_ref[2]),
                               atol=1e-4)  # d aux


def test_fullfused_cond_batch_padding(kb, cond_data):
    """Batch not a multiple of the block: padding + slicing correct."""
    xs, aux, params, H = cond_data
    ref = _cond_ref(params, xs[:1], aux[:1], H)
    got = kb.blstm_layer_fullfused_cond(params, xs[:1], aux[:1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_estimator_cond_fused_matches_default(kb, cond_data, monkeypatch):
    """The estimator path with CONDFUSE on == the materialized default,
    including permutation-trial ensembling riding through the fused
    call (aux expansion == product expansion)."""
    from tssep_tpu.nn import estimator as est_mod
    from tssep_tpu.nn import rnnp as rnnp_mod
    from tssep_tpu.config import from_config, get_config

    B, S, T, F = 2, 4, 23, 12
    cfg = dict(idim=F, odim=F, units=16, projs=10, combination='mul',
               ts_vad=S, output_resolution='tf', aux_net_output_size=F,
               random_speaker_order=False, num_averaged_permutations=2)
    est = from_config(get_config(
        'tssep_tpu.nn.estimator.MaskEstimator', cfg))
    params = est.init(jax.random.PRNGKey(0))
    xs = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (B, T, F)))
    aux = np.asarray(jax.random.normal(jax.random.PRNGKey(8), (B, S, F)))

    ref = est.apply(params, xs, aux)

    monkeypatch.setattr(rnnp_mod, 'CONDFUSE', True)
    monkeypatch.setattr(rnnp_mod, '_FORCED_IMPL', 'pallas')
    got = est.apply(params, xs, aux)
    np.testing.assert_allclose(np.asarray(got.mask), np.asarray(ref.mask),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.logit),
                               np.asarray(ref.logit), atol=2e-4)
