"""Fused Pallas ConvGRU vs the scan implementation: bit-compatible values
and matching gradients, including train-mode dropout (shared PRNG chain)."""

import numpy as np

import jax
import jax.numpy as jnp

from dpc_tpu.models import convgru


def _setup(b=2, t=5, h=4, w=4, cin=16, ch=16, seed=0):
    params = convgru.init_convgru(jax.random.PRNGKey(seed), cin, ch, 1, 1)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, t, h, w, cin))
    return params, x


def test_eval_mode_matches_scan():
    params, x = _setup()
    out_s, last_s = convgru.apply_convgru(params, x, train=False,
                                          impl="scan")
    out_p, last_p = convgru.apply_convgru(params, x, train=False,
                                          impl="pallas")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(last_p), np.asarray(last_s),
                               rtol=1e-5, atol=1e-6)


def test_train_dropout_matches_scan():
    """Same PRNG chain ⇒ same dropout masks ⇒ identical outputs."""
    params, x = _setup(seed=3)
    key = jax.random.PRNGKey(42)
    out_s, _ = convgru.apply_convgru(params, x, train=True, dropout=0.1,
                                     key=key, impl="scan")
    out_p, _ = convgru.apply_convgru(params, x, train=True, dropout=0.1,
                                     key=key, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               rtol=1e-5, atol=1e-6)


def test_multilayer_matches_scan():
    params = convgru.init_convgru(jax.random.PRNGKey(0), 8, 8, 1, 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 2, 2, 8))
    out_s, last_s = convgru.apply_convgru(params, x, train=False,
                                          impl="scan")
    out_p, last_p = convgru.apply_convgru(params, x, train=False,
                                          impl="pallas")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(last_p), np.asarray(last_s),
                               rtol=1e-5, atol=1e-6)


def test_gradients_match_scan():
    params, x = _setup(seed=7)

    def loss(impl, params, x):
        out, last = convgru.apply_convgru(params, x, train=False, impl=impl)
        return jnp.sum(out ** 2) + jnp.sum(jnp.sin(last))

    gs = jax.grad(lambda p, x: loss("scan", p, x), argnums=(0, 1))(params, x)
    gp = jax.grad(lambda p, x: loss("pallas", p, x),
                  argnums=(0, 1))(params, x)
    flat_s = jax.tree.leaves(gs)
    flat_p = jax.tree.leaves(gp)
    for a, b in zip(flat_s, flat_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_gradients_with_dropout_match_scan():
    params, x = _setup(seed=11)
    key = jax.random.PRNGKey(5)

    def loss(impl, params, x):
        out, _ = convgru.apply_convgru(params, x, train=True, dropout=0.1,
                                       key=key, impl=impl)
        return jnp.sum(out ** 2)

    gs = jax.grad(lambda p: loss("scan", p, x))(params)
    gp = jax.grad(lambda p: loss("pallas", p, x))(params)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_dpc_forward_with_pallas_gru():
    """Full DPC forward with gru_impl='pallas' equals the scan config."""
    from dpc_tpu.core.config import DPCConfig
    from dpc_tpu.models import dpc
    import dataclasses

    cfg_s = DPCConfig(img_dim=32, num_seq=3, seq_len=4, pred_step=1)
    cfg_p = dataclasses.replace(cfg_s, gru_impl="pallas")
    params = dpc.init_dpc(jax.random.PRNGKey(0), cfg_s)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 32, 32, 3))
    s_s, _, _ = dpc.apply_dpc(params, x, cfg=cfg_s, train=False)
    s_p, _, _ = dpc.apply_dpc(params, x, cfg=cfg_p, train=False)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_s),
                               rtol=1e-4, atol=1e-5)


def test_non_tileable_rows():
    """Row counts with no power-of-two divisor (e.g. 7×7 grids) must pad."""
    params = convgru.init_convgru(jax.random.PRNGKey(0), 8, 8, 1, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 7, 7, 8))
    out_s, last_s = convgru.apply_convgru(params, x, train=False,
                                          impl="scan")
    out_p, last_p = convgru.apply_convgru(params, x, train=False,
                                          impl="pallas")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               rtol=1e-5, atol=1e-6)

    def loss(impl):
        out, _ = convgru.apply_convgru(params, x, train=False, impl=impl)
        return jnp.sum(out ** 2)

    gs = jax.grad(lambda p: jnp.sum(convgru.apply_convgru(
        p, x, train=False, impl="scan")[0] ** 2))(params)
    gp = jax.grad(lambda p: jnp.sum(convgru.apply_convgru(
        p, x, train=False, impl="pallas")[0] ** 2))(params)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
