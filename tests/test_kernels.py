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
