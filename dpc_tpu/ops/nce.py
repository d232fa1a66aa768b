"""Dense spatio-temporal InfoNCE: score, mask, targets, loss.

The DPC objective scores every predicted spatial cell against every
ground-truth future cell in the (local) batch with one big matmul, then asks
each prediction to classify its own true cell among all candidates.

Reference behaviour being matched:
  * score 6-tensor ``[B, P, SQ, B, N, SQ]`` via a single matmul
    (``dpc/model_3d.py:76-84``; note the reference rebinds N := pred_step at
    ``:79`` because only the last ``pred_step`` GT blocks participate);
  * the int8 semantic mask with codes {1: positive, -1: temporal negative,
    -3: spatial negative, 0: easy negative, -2: omit-unused}
    (``dpc/model_3d.py:86-96``);
  * the training target = argmax of the one-hot positive row after
    flattening (``dpc/main.py:209-217``) — which this module computes in
    closed form instead of materialising the boolean mask;
  * plain softmax cross-entropy over the flattened ``[B·P·SQ, B·P·SQ]``
    score matrix (``dpc/main.py:67,217``).

Everything here is a pure function of static shapes: masks/targets are
computed host-side once per (B, P, SQ) and closed over by the jitted step —
the TPU-native equivalent of the reference's lazy per-replica mask cache
(``dpc/model_3d.py:41,86,96``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Semantic mask codes (reference dpc/model_3d.py:87)
POSITIVE = 1
EASY_NEG = 0        # different sample in batch
TEMPORAL_NEG = -1   # same sample & spatial cell, wrong time step
OMIT = -2           # reserved, never assigned in the canonical config
SPATIAL_NEG = -3    # same sample, different spatial cell


@functools.lru_cache(maxsize=16)
def nce_mask(batch: int, pred_step: int, sq: int) -> np.ndarray:
    """Full semantic mask, vectorised.

    Returns int8 ``[B, P, SQ, B, P, SQ]``.  Axis meaning: (pred sample,
    pred step, pred cell, GT sample, GT step, GT cell).  Equivalent to the
    loop construction at ``dpc/model_3d.py:88-95``.
    """
    b = np.arange(batch)
    p = np.arange(pred_step)
    q = np.arange(sq)
    same_b = (b[:, None] == b[None, :])[:, None, None, :, None, None]
    same_q = (q[:, None] == q[None, :])[None, None, :, None, None, :]
    same_p = (p[:, None] == p[None, :])[None, :, None, None, :, None]
    mask = np.zeros((batch, pred_step, sq, batch, pred_step, sq), np.int8)
    mask = np.where(same_b, SPATIAL_NEG, mask)
    mask = np.where(same_b & same_q, TEMPORAL_NEG, mask)
    mask = np.where(same_b & same_q & same_p, POSITIVE, mask)
    return mask.astype(np.int8)


@functools.lru_cache(maxsize=16)
def nce_targets(batch: int, pred_step: int, sq: int) -> np.ndarray:
    """Closed-form positive indices for the flattened score matrix.

    Row (b, p, q) of the flattened ``[B·P·SQ, B·P·SQ]`` score has its
    positive at column (b, p, q): the diagonal.  This is exactly
    ``mask.view(R, C).argmax(1)`` of the reference (``dpc/main.py:215``).
    """
    n = batch * pred_step * sq
    return np.arange(n, dtype=np.int32)


def dense_score(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """All-pairs similarity between predicted and GT dense embeddings.

    pred, gt: ``[B, P, S, S, D]`` (channels-last).  Returns the flattened
    score matrix ``[B·P·S², B·P·S²]`` in float32 — one MXU matmul.
    """
    b, p, s, _, d = pred.shape
    rows = pred.reshape(b * p * s * s, d)
    cols = gt.reshape(b * p * s * s, d)
    return jnp.dot(rows, cols.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def dense_score_6d(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """6-D view of :func:`dense_score`, matching ``dpc/model_3d.py:83``."""
    b, p, s, _, _ = pred.shape
    return dense_score(pred, gt).reshape(b, p, s * s, b, p, s * s)


def nce_loss(score: jax.Array, targets: jax.Array) -> tuple[jax.Array, dict]:
    """Softmax cross-entropy over the flattened score matrix + top-k stats.

    score: ``[R, C]`` float32 logits; targets: ``[R]`` int32.
    Returns (scalar loss, {'top1','top3','top5'} accuracies) — the metric
    set of ``dpc/main.py:217-218`` / ``utils/utils.py:38``.
    """
    logz = jax.nn.logsumexp(score, axis=-1)
    pos = jnp.take_along_axis(score, targets[:, None].astype(jnp.int32),
                              axis=-1)[:, 0]
    loss = jnp.mean(logz - pos)
    metrics = topk_accuracy(score, targets, (1, 3, 5))
    return loss, metrics


def topk_accuracy(score: jax.Array, targets: jax.Array,
                  ks: tuple[int, ...] = (1, 3, 5)) -> dict:
    """Fraction of rows whose positive ranks in the top-k columns.
    k is clamped to the candidate count (tiny configs can have < 5 cols)."""
    ncols = score.shape[-1]
    maxk = min(max(ks), ncols)
    _, idx = jax.lax.top_k(score, maxk)
    hit = idx == targets[:, None]
    return {f"top{k}": jnp.mean(
        jnp.any(hit[:, :min(k, ncols)], axis=-1).astype(jnp.float32))
        for k in ks}


def default_hbm_bytes() -> int:
    """Per-device HBM capacity, from the runtime when it reports one
    (TPU backends do), else the v5e default of 16 GiB."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return 16 * 2**30


def pick_nce_impl(n_rows: int, n_cols: int,
                  hbm_bytes: int | None = None,
                  budget_frac: float = 0.125) -> str:
    """Choose 'xla' or 'fused' for the NCE loss by projected score bytes.

    Measured on v5e (docs/RESULTS.md "Flash-NCE kernel at scale"): the XLA
    matmul+softmax path wins on time at every shape whose score matrix fits
    comfortably in HBM (it materialises the score once forward and the
    softmax once backward ⇒ ~2·R·C·4 bytes live next to the backbone
    activations); the flash kernel keeps O(R) state and wins only in the
    capacity regime.  The crossover is therefore a memory test, not a speed
    test: take the fused path when the two score-sized buffers would claim
    more than ``budget_frac`` of HBM (default 1/8 ⇒ 2 GiB on v5e).
    """
    if hbm_bytes is None:
        hbm_bytes = default_hbm_bytes()
    score_bytes = 2 * 4 * n_rows * n_cols
    return "fused" if score_bytes > budget_frac * hbm_bytes else "xla"


def mask_code_stats(score: jax.Array, mask: np.ndarray) -> dict:
    """Mean score per semantic code — the analysis view the reference's
    finer mask codes exist for (only code 1 is consumed in training)."""
    flat_score = score.reshape(-1)
    flat_mask = jnp.asarray(mask.reshape(-1))
    out = {}
    for name, code in (("pos", POSITIVE), ("temporal_neg", TEMPORAL_NEG),
                       ("spatial_neg", SPATIAL_NEG), ("easy_neg", EASY_NEG)):
        sel = flat_mask == code
        denom = jnp.maximum(jnp.sum(sel), 1)
        out[name] = jnp.sum(jnp.where(sel, flat_score, 0.0)) / denom
    return out
