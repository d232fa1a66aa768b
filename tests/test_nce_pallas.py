"""Fused Pallas NCE vs the reference jnp implementation: values, metrics,
and gradients (interpret mode on CPU; compiled on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from dpc_tpu.ops import nce, nce_pallas


def _data(b=2, p=3, s=4, d=32, seed=0, cols_scale=1):
    rng = np.random.default_rng(seed)
    pred = rng.normal(size=(b, p, s, s, d)).astype(np.float32)
    gt = rng.normal(size=(b * cols_scale, p, s, s, d)).astype(np.float32)
    return jnp.asarray(pred), jnp.asarray(gt)


def test_forward_matches_reference():
    pred, gt = _data()
    loss_ref, metrics_ref = nce.nce_loss(
        nce.dense_score(pred, gt),
        jnp.asarray(nce.nce_targets(2, 3, 16)))
    loss, metrics = nce_pallas.fused_nce_loss(pred, gt, r_tile=32,
                                              c_tile=64)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for k in ("top1", "top3", "top5"):
        np.testing.assert_allclose(float(metrics[k]),
                                   float(metrics_ref[k]), atol=1e-6)


def test_forward_non_divisible_tiles():
    # R = 96, C = 96 with tiles 64: exercises padding/masking
    pred, gt = _data(b=2, p=3, s=4, d=32, seed=1)
    loss_ref, _ = nce.nce_loss(nce.dense_score(pred, gt),
                               jnp.asarray(nce.nce_targets(2, 3, 16)))
    loss, _ = nce_pallas.fused_nce_loss(pred, gt, r_tile=64, c_tile=64)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)


def test_asymmetric_global_pool():
    """gt pool 4× wider than pred rows (global-negatives shape)."""
    pred, gt = _data(b=2, p=2, s=2, d=16, seed=2, cols_scale=4)
    rows = pred.reshape(-1, 16)
    cols = gt.reshape(-1, 16)
    targets = jnp.arange(rows.shape[0], dtype=jnp.int32) + 8  # arbitrary
    score = rows @ cols.T
    lse_ref = jax.nn.logsumexp(score, axis=-1)
    pos_ref = jnp.take_along_axis(score, targets[:, None], -1)[:, 0]
    loss_ref = jnp.mean(lse_ref - pos_ref)
    loss, _ = nce_pallas.fused_nce_loss(pred, gt, targets=targets,
                                        r_tile=16, c_tile=32)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)


def test_gradients_match_reference():
    pred, gt = _data(b=2, p=2, s=2, d=16, seed=3)
    targets = jnp.asarray(nce.nce_targets(2, 2, 4))

    def ref_loss(pred, gt):
        loss, _ = nce.nce_loss(nce.dense_score(pred, gt), targets)
        return loss

    def fused_loss(pred, gt):
        loss, _ = nce_pallas.fused_nce_loss(pred, gt, r_tile=16, c_tile=16)
        return loss

    g_ref = jax.grad(ref_loss, argnums=(0, 1))(pred, gt)
    g_fused = jax.grad(fused_loss, argnums=(0, 1))(pred, gt)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_rank_metric_is_exact_topk():
    pred, gt = _data(b=3, p=1, s=2, d=8, seed=4)
    rows = pred.reshape(-1, 8)
    targets = jnp.arange(rows.shape[0], dtype=jnp.int32)
    _, _, rank = nce_pallas.nce_lse_rank(rows, gt.reshape(-1, 8), targets,
                                         8, 8, (1, 3, 5))
    score = np.asarray(rows @ gt.reshape(-1, 8).T)
    order = np.argsort(-score, axis=1)
    for k in (1, 3, 5):
        want = (order[:, :k] == np.arange(12)[:, None]).any(1).mean()
        got = (np.asarray(rank) < k).mean()
        np.testing.assert_allclose(got, want)
