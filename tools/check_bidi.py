"""Correctness check: interleaved bidirectional kernel vs scan path (TPU).

Usage: python tools/check_bidi.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault('TSSEP_LSTM_DTYPE', 'float32')

import jax
import jax.numpy as jnp
import numpy as np

from tssep_tpu.nn import rnnp
from tssep_tpu.nn.init import torch_lstm_init
from tssep_tpu.kernels import blstm as kb


def main():
    B, T, I, H = 16, 37, 12, 20   # odd T exercises time padding
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, I), jnp.float32)
    params = torch_lstm_init(jax.random.PRNGKey(1), I, H)
    params.update({k + '_reverse': v for k, v in
                   torch_lstm_init(jax.random.PRNGKey(2), I, H).items()})

    ref = jax.jit(lambda p, x: rnnp._blstm_apply_impl(p, x, H, True))(
        params, x)
    got = jax.jit(lambda p, x: kb.blstm_apply_fused_bidi(
        p, x, hidden_size=H))(params, x)
    err = float(jnp.max(jnp.abs(ref - got)))
    print('fwd max err:', err)
    assert err < 2e-3, err

    def loss_ref(p, x):
        return jnp.sum(rnnp._blstm_apply_impl(p, x, H, True) ** 2)

    def loss_bidi(p, x):
        return jnp.sum(kb.blstm_apply_fused_bidi(p, x, hidden_size=H) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(params, x)
    g_bidi = jax.jit(jax.grad(loss_bidi))(params, x)
    gx_ref = jax.jit(jax.grad(loss_ref, argnums=1))(params, x)
    gx_bidi = jax.jit(jax.grad(loss_bidi, argnums=1))(params, x)
    for k in sorted(g_ref):
        a, b = np.asarray(g_ref[k]), np.asarray(g_bidi[k])
        e = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        print(f'  grad {k}: rel err {e:.2e}')
        assert e < 5e-3, (k, e)
    e = float(jnp.max(jnp.abs(gx_ref - gx_bidi)))
    print('input grad max err:', e)
    assert e < 2e-3, e
    print('BIDI KERNEL OK')

    # Layer-level projection-recompute VJP
    def loss_layer(p, x):
        return jnp.sum(kb.blstm_layer_fused(p, x) ** 2)

    out_layer = jax.jit(lambda p, x: kb.blstm_layer_fused(p, x))(params, x)
    e = float(jnp.max(jnp.abs(ref - out_layer)))
    print('layer-vjp fwd max err:', e)
    assert e < 2e-3, e
    g_lay = jax.jit(jax.grad(loss_layer))(params, x)
    gx_lay = jax.jit(jax.grad(loss_layer, argnums=1))(params, x)
    for k in sorted(g_ref):
        a, b = np.asarray(g_ref[k]), np.asarray(g_lay[k])
        e = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        print(f'  layer-vjp grad {k}: rel err {e:.2e}')
        assert e < 5e-3, (k, e)
    e = float(jnp.max(jnp.abs(gx_ref - gx_lay)))
    print('layer-vjp input grad max err:', e)
    assert e < 2e-3, e
    print('LAYER VJP OK')

    # Fully-fused layer (in-kernel input projections)
    def loss_ff(p, x):
        return jnp.sum(kb.blstm_layer_fullfused(p, x) ** 2)

    out_ff = jax.jit(lambda p, x: kb.blstm_layer_fullfused(p, x))(params, x)
    e = float(jnp.max(jnp.abs(ref - out_ff)))
    print('fullfuse fwd max err:', e)
    assert e < 2e-3, e
    g_ff = jax.jit(jax.grad(loss_ff))(params, x)
    gx_ff = jax.jit(jax.grad(loss_ff, argnums=1))(params, x)
    for k in sorted(g_ref):
        a, b = np.asarray(g_ref[k]), np.asarray(g_ff[k])
        e = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        print(f'  fullfuse grad {k}: rel err {e:.2e}')
        assert e < 5e-3, (k, e)
    e = float(jnp.max(jnp.abs(gx_ref - gx_ff)))
    print('fullfuse input grad max err:', e)
    assert e < 2e-3, e
    print('FULLFUSE OK')

    # Block-spilled fully-fused layer (boundary-state residuals;
    # restructured backward)
    def loss_sp(p, x):
        return jnp.sum(kb.blstm_layer_fullfused_spill(p, x) ** 2)

    out_sp = jax.jit(
        lambda p, x: kb.blstm_layer_fullfused_spill(p, x))(params, x)
    e = float(jnp.max(jnp.abs(ref - out_sp)))
    print('spill fwd max err:', e)
    assert e < 2e-3, e
    g_sp = jax.jit(jax.grad(loss_sp))(params, x)
    gx_sp = jax.jit(jax.grad(loss_sp, argnums=1))(params, x)
    for k in sorted(g_ref):
        a, b = np.asarray(g_ref[k]), np.asarray(g_sp[k])
        e = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        print(f'  spill grad {k}: rel err {e:.2e}')
        assert e < 5e-3, (k, e)
    e = float(jnp.max(jnp.abs(gx_ref - gx_sp)))
    print('spill input grad max err:', e)
    assert e < 2e-3, e
    print('SPILL OK')

    # Conditioned fully-fused layer ((xs * aux) formed in VMEM)
    S = 4
    aux = jax.random.normal(jax.random.PRNGKey(3), (B, S, I), jnp.float32)

    def cond_ref_fn(p, xs, aux):
        h = xs[:, None, :, :] * aux[:, :, None, :]
        h = h.reshape((B * S,) + h.shape[2:])
        out = rnnp._blstm_apply_impl(p, h, H, True)
        return out.reshape((B, S) + out.shape[1:])

    ref_c = jax.jit(cond_ref_fn)(params, x, aux)
    got_c = jax.jit(kb.blstm_layer_fullfused_cond)(params, x, aux)
    e = float(jnp.max(jnp.abs(ref_c - got_c)))
    print('condfuse fwd max err:', e)
    assert e < 2e-3, e

    def loss_cref(p, xs, aux):
        return jnp.sum(cond_ref_fn(p, xs, aux) ** 2)

    def loss_cffc(p, xs, aux):
        return jnp.sum(kb.blstm_layer_fullfused_cond(p, xs, aux) ** 2)

    g_cref = jax.jit(jax.grad(loss_cref, argnums=(0, 1, 2)))(params, x, aux)
    g_cffc = jax.jit(jax.grad(loss_cffc, argnums=(0, 1, 2)))(params, x, aux)
    for k in sorted(g_cref[0]):
        a, b = np.asarray(g_cref[0][k]), np.asarray(g_cffc[0][k])
        e = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        print(f'  condfuse grad {k}: rel err {e:.2e}')
        assert e < 5e-3, (k, e)
    for name, i in (('xs', 1), ('aux', 2)):
        e = float(jnp.max(jnp.abs(g_cref[i] - g_cffc[i])))
        print(f'condfuse d{name} max err:', e)
        assert e < 2e-3, e
    print('CONDFUSE OK')


if __name__ == '__main__':
    main()
