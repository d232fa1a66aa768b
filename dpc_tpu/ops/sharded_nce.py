"""Candidate-sharded dense NCE: tensor/sequence parallelism for the score.

The dense score matrix is the only all-to-all-ish object in DPC (SURVEY §5):
with global negatives its column axis grows with the GLOBAL batch
(``C = B_global · P · SQ``), so at scale (R34-224: SQ=49; batch 128+) the
``[R_local, C]`` matrix and its softmax dominate per-device memory.  This
module shards the CANDIDATE axis over the mesh's ``'model'`` axis:

  * each model-peer scores the local predictions against a 1/m slice of the
    gathered GT pool (one MXU matmul, m× smaller);
  * the softmax normaliser is combined with a numerically-stable
    cross-device logsumexp (pmax + psum over 'model');
  * the positive logit lives on exactly one peer and is psum-selected;
  * top-k metrics re-rank the per-shard top-k (all_gather of k·R scalars).

This is the sharded-softmax pattern of sequence-parallel attention, applied
to contrastive scoring.  Communication per step: 2 scalars-per-row psums +
one k-per-row gather — all over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dpc_tpu.ops import nce as nce_ops
from dpc_tpu.ops import nce_pallas


def _slice_for_axis(x: jax.Array, axis_name: str) -> jax.Array:
    """Static 1/m slice of the leading axis owned by this model-peer."""
    m = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    assert x.shape[0] % m == 0, (x.shape, m)
    sz = x.shape[0] // m
    return jax.lax.dynamic_slice_in_dim(x, idx * sz, sz, axis=0)


def sharded_nce_loss(pred: jax.Array, gt: jax.Array, *,
                     data_axis: str = "data", model_axis: str = "model",
                     ks: tuple[int, ...] = (1, 3, 5), impl: str = "auto"
                     ) -> tuple[jax.Array, dict]:
    """Global-negative NCE with the candidate axis sharded over
    ``model_axis``.

    pred, gt: local ``[B_l, P, S, S, D]``.  Returns (loss, metrics) —
    already psum'd/pmean'd over both axes, identical on every device.
    Numerically equals the unsharded global-negatives loss.

    ``impl`` picks how each peer scores its ``[R_l, C/m]`` tile: 'xla'
    materialises it (fine while it fits HBM), 'fused' streams it through
    the flash kernel (``nce_pallas.nce_lse_rank_shard``) so the tile
    never exists in HBM — 'auto' applies the same projected-bytes
    heuristic as the unsharded paths (``ops/nce.py::pick_nce_impl``) to
    the PER-SHARD tile, composing the capacity regime with the model
    axis instead of making them mutually exclusive.
    """
    bl, p, s, _, d = pred.shape
    rows = pred.reshape(bl * p * s * s, d).astype(jnp.float32)

    # global GT pool, then this peer's candidate slice
    gt_all = jax.lax.all_gather(gt, data_axis, axis=0, tiled=True)
    bg = gt_all.shape[0]
    cols_full = gt_all.reshape(bg * p * s * s, d).astype(jnp.float32)
    cols = _slice_for_axis(cols_full, model_axis)
    c_local = cols.shape[0]

    if impl == "auto":
        impl = nce_ops.pick_nce_impl(rows.shape[0], c_local)
    if impl not in ("xla", "fused"):
        raise ValueError(f"impl must be 'auto'|'xla'|'fused', got {impl!r}")
    if impl == "fused":
        return _sharded_fused(rows, cols, bl, p, s, c_local,
                              data_axis, model_axis, ks)

    score = jnp.dot(rows, cols.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # [R_l, C/m]

    # stable cross-shard logsumexp over the candidate axis; the max shift
    # cancels analytically, so it is computed outside AD (pmax has no
    # differentiation rule — gather the per-shard maxima instead)
    local_max = jax.lax.stop_gradient(jnp.max(score, axis=-1))
    gmax = jnp.max(jax.lax.all_gather(local_max, model_axis, axis=0),
                   axis=0)
    sumexp = jnp.sum(jnp.exp(score - gmax[:, None]), axis=-1)
    logz = jnp.log(jax.lax.psum(sumexp, model_axis)) + gmax

    # positive logit: global column ((shard_d·bl + b), p, q) → one peer owns it
    r_per_dev = bl * p * s * s
    shard_d = jax.lax.axis_index(data_axis)
    shard_m = jax.lax.axis_index(model_axis)
    global_pos = shard_d * r_per_dev + jnp.arange(r_per_dev, dtype=jnp.int32)
    local_pos = global_pos - shard_m * c_local
    owned = (local_pos >= 0) & (local_pos < c_local)
    safe = jnp.clip(local_pos, 0, c_local - 1)
    pos_here = jnp.take_along_axis(score, safe[:, None], axis=-1)[:, 0]
    pos = jax.lax.psum(jnp.where(owned, pos_here, 0.0), model_axis)

    loss = jnp.mean(logz - pos)
    loss = jax.lax.pmean(loss, data_axis)

    # top-k: re-rank the union of per-shard top-k (exact for global top-k)
    maxk = min(max(ks), c_local)
    topv, topi = jax.lax.top_k(score, maxk)                  # [R, k] local
    top_global_idx = topi + shard_m * c_local
    allv = jax.lax.all_gather(topv, model_axis, axis=1, tiled=True)
    alli = jax.lax.all_gather(top_global_idx, model_axis, axis=1, tiled=True)
    order = jnp.argsort(-allv, axis=-1)[:, :max(ks)]
    ranked_idx = jnp.take_along_axis(alli, order, axis=-1)
    hit = ranked_idx == global_pos[:, None]
    metrics = {}
    for k in ks:
        acc = jnp.mean(jnp.any(hit[:, :k], axis=-1).astype(jnp.float32))
        metrics[f"top{k}"] = jax.lax.pmean(
            jax.lax.pmean(acc, model_axis), data_axis)
    return loss, metrics


def _sharded_fused(rows, cols, bl, p, s, c_local, data_axis, model_axis,
                   ks):
    """Flash-NCE over this peer's candidate slice + cross-shard combine.

    Per step this moves only O(R) scalars over ICI: one pos psum, one
    [m, R] lse gather, one rank psum — the [R_l, C/m] score tile lives
    exclusively in the kernel's VMEM pipeline.
    """
    r_per_dev = bl * p * s * s
    shard_d = jax.lax.axis_index(data_axis)
    shard_m = jax.lax.axis_index(model_axis)
    global_pos = shard_d * r_per_dev + jnp.arange(r_per_dev,
                                                  dtype=jnp.int32)
    local_pos = global_pos - shard_m * c_local
    owned = (local_pos >= 0) & (local_pos < c_local)
    safe = jnp.clip(local_pos, 0, c_local - 1)

    # positive logit: elementwise dot on the owning peer, psum-broadcast
    # (plain JAX — AD routes its loss-term gradient to the owner)
    pos_here = jnp.sum(rows * cols[safe], axis=-1)
    pos = jax.lax.psum(jnp.where(owned, pos_here, 0.0), model_axis)
    # local target column on the owner, -1 elsewhere: only the owner
    # excludes the positive from its rank count
    tgt_local = jnp.where(owned, safe, -1).astype(jnp.int32)

    lse_local, rank_local = nce_pallas.nce_lse_rank_shard(
        rows, cols, pos, tgt_local)

    # stable cross-shard logsumexp of the per-shard logsumexps (the max
    # shift cancels analytically — keep it outside AD)
    lse_all = jax.lax.all_gather(lse_local, model_axis, axis=0)  # [m, R]
    gmax = jax.lax.stop_gradient(jnp.max(lse_all, axis=0))
    logz = jnp.log(jnp.sum(jnp.exp(lse_all - gmax), axis=0)) + gmax

    loss = jax.lax.pmean(jnp.mean(logz - pos), data_axis)

    # exact global rank: per-shard counts of columns beating the positive
    rank = jax.lax.psum(rank_local, model_axis)
    metrics = {
        f"top{k}": jax.lax.pmean(
            jnp.mean((rank < k).astype(jnp.float32)), data_axis)
        for k in ks}
    return loss, metrics
