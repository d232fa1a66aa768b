"""Fused dense-NCE loss as a Pallas TPU kernel (flash-softmax style).

The reference materialises the full 6-D score tensor in HBM and feeds it to
a separate CrossEntropyLoss (``dpc/model_3d.py:83`` + ``dpc/main.py:217``).
At scale the ``[R, C] = [B·P·SQ, B_global·P·SQ]`` score matrix dominates
memory (R34-224 global-negatives: 6k × 50k × 4B ≈ 1.2 GB per direction).
This kernel streams column tiles of the GT pool through VMEM and keeps only
O(R) statistics — the score matrix never exists in HBM, forward or backward:

  forward:  online logsumexp over column tiles + the positive-rank count
            (rank_i = #{j : s_ij > s_i,pos}) for exact top-k metrics;
  backward: recompute score tiles, emit dpred = softmax @ gt and
            dgt = softmaxᵀ @ pred, with the one-hot positive term applied
            outside (a cheap gather/scatter).

loss_i = logsumexp_j(s_ij) − s_i,pos — identical to
``ops.nce.nce_loss`` (verified in tests/test_nce_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_to(x: jax.Array, size: int, axis: int, value=0.0) -> jax.Array:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# ---------------------------------------------------------------------------
# Forward: per-row logsumexp + positive rank
# ---------------------------------------------------------------------------

def _fwd_kernel(rows_ref, cols_ref, pos_ref, tgt_ref, lse_ref, rank_ref,
                m_ref, s_ref, *, c_tiles: int, c_valid: int, c_tile: int):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)
        rank_ref[:] = jnp.zeros_like(rank_ref)

    score = jnp.dot(rows_ref[:], cols_ref[:].T,
                    preferred_element_type=jnp.float32)  # [R_t, C_t]
    # mask out padding columns
    col_ids = ci * c_tile + jax.lax.broadcasted_iota(
        jnp.int32, score.shape, 1)
    score = jnp.where(col_ids < c_valid, score, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(score, axis=-1, keepdims=True))
    s_ref[:] = s_ref[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.exp(score - m_new), axis=-1, keepdims=True)
    m_ref[:] = m_new
    # rank: columns strictly beating the positive, EXCLUDING the positive
    # itself (its matmul value differs from the elementwise-dot `pos` by
    # reduction order, which would poison a strict comparison)
    beats = (score > pos_ref[:]) & (col_ids != tgt_ref[:])
    rank_ref[:] += jnp.sum(beats.astype(jnp.float32), axis=-1,
                           keepdims=True)

    @pl.when(ci == c_tiles - 1)
    def _():
        lse_ref[:] = jnp.log(s_ref[:]) + m_ref[:]


def _nce_forward(rows: jax.Array, cols: jax.Array, pos: jax.Array,
                 targets: jax.Array, r_tile: int, c_tile: int
                 ) -> tuple[jax.Array, jax.Array]:
    r, d = rows.shape
    c = cols.shape[0]
    rp = int(np.ceil(r / r_tile)) * r_tile
    cp = int(np.ceil(c / c_tile)) * c_tile
    rows_p = _pad_to(rows, rp, 0)
    cols_p = _pad_to(cols, cp, 0)
    pos_p = _pad_to(pos[:, None], rp, 0)
    tgt_p = _pad_to(targets.astype(jnp.int32)[:, None], rp, 0, value=-1)
    grid = (rp // r_tile, cp // c_tile)

    lse, rank = pl.pallas_call(
        functools.partial(_fwd_kernel, c_tiles=grid[1], c_valid=c,
                          c_tile=c_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r_tile, d), lambda ri, ci: (ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile, d), lambda ri, ci: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, 1), lambda ri, ci: (ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, 1), lambda ri, ci: (ri, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((r_tile, 1), lambda ri, ci: (ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, 1), lambda ri, ci: (ri, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r_tile, 1), jnp.float32),
            pltpu.VMEM((r_tile, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(rows_p, cols_p, pos_p, tgt_p)
    return lse[:r, 0], rank[:r, 0]


# ---------------------------------------------------------------------------
# Backward: drows = P @ cols, dcols = Pᵀ @ rows  (P = softmax, recomputed)
# ---------------------------------------------------------------------------

def _softmax_tile(rows, cols, lse, g, ri, ci, r_tile, c_tile,
                  r_valid, c_valid):
    """Recompute the (masked) softmax·g tile from its inputs."""
    score = jnp.dot(rows, cols.T, preferred_element_type=jnp.float32)
    p = jnp.exp(score - lse)
    col_ids = ci * c_tile + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    row_ids = ri * r_tile + jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
    p = jnp.where((col_ids < c_valid) & (row_ids < r_valid), p, 0.0)
    return p * g


def _bwd_rows_kernel(rows_ref, cols_ref, lse_ref, g_ref, drows_ref,
                     *, c_valid: int, c_tile: int, r_valid: int,
                     r_tile: int):
    ri, ci = pl.program_id(0), pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        drows_ref[:] = jnp.zeros_like(drows_ref)

    pg = _softmax_tile(rows_ref[:], cols_ref[:], lse_ref[:], g_ref[:],
                       ri, ci, r_tile, c_tile, r_valid, c_valid)
    drows_ref[:] += jnp.dot(pg, cols_ref[:],
                            preferred_element_type=jnp.float32)


def _bwd_cols_kernel(rows_ref, cols_ref, lse_ref, g_ref, dcols_ref,
                     *, c_valid: int, c_tile: int, r_valid: int,
                     r_tile: int):
    ci, ri = pl.program_id(0), pl.program_id(1)  # transposed grid

    @pl.when(ri == 0)
    def _():
        dcols_ref[:] = jnp.zeros_like(dcols_ref)

    pg = _softmax_tile(rows_ref[:], cols_ref[:], lse_ref[:], g_ref[:],
                       ri, ci, r_tile, c_tile, r_valid, c_valid)
    dcols_ref[:] += jnp.dot(pg.T, rows_ref[:],
                            preferred_element_type=jnp.float32)


def _bwd_fused_kernel(rows_ref, cols_ref, lse_ref, g_ref, drows_ref,
                      dcols_ref, *, c_valid: int, c_tile: int,
                      r_valid: int, r_tile: int):
    """Single sweep over column tiles with the full row block resident in
    VMEM: each score tile is recomputed ONCE and feeds both dot products
    (the two-sweep fallback recomputes it twice — round-1 VERDICT item)."""
    ci = pl.program_id(0)

    @pl.when(ci == 0)
    def _():
        drows_ref[:] = jnp.zeros_like(drows_ref)

    pg = _softmax_tile(rows_ref[:], cols_ref[:], lse_ref[:], g_ref[:],
                       0, ci, r_tile, c_tile, r_valid, c_valid)
    dcols_ref[:] = jnp.dot(pg.T, rows_ref[:],
                           preferred_element_type=jnp.float32)
    # drows block index is constant over the whole grid: the safe
    # revisit-free accumulation pattern.
    drows_ref[:] += jnp.dot(pg, cols_ref[:],
                            preferred_element_type=jnp.float32)


# Leave ~4 MB of the ~16 MB/core VMEM for Mosaic's own double-buffering.
_FUSED_BWD_VMEM_BUDGET = 12 * 2**20


def _fused_bwd_c_tile(rp: int, d: int, c_tile: int) -> int | None:
    """Largest column tile whose single-sweep working set fits VMEM
    (rows + drows resident, one cols/dcols tile, the pg tile, lse/g),
    or None when even a 128-wide tile does not fit."""
    for ct in (c_tile, 512, 256, 128):
        if ct > c_tile:
            continue
        used = 4 * (2 * rp * d + 2 * ct * d + rp * ct + 2 * rp)
        if used <= _FUSED_BWD_VMEM_BUDGET:
            return ct
    return None


def _nce_backward_fused(rows, cols, lse, g, c_tile):
    r, d = rows.shape
    c = cols.shape[0]
    rp = max(int(np.ceil(r / 8)) * 8, 8)  # sublane-align the row block
    cp = int(np.ceil(c / c_tile)) * c_tile
    rows_p = _pad_to(rows, rp, 0)
    lse_p = _pad_to(lse[:, None], rp, 0)
    g_p = _pad_to(g[:, None], rp, 0)
    cols_p = _pad_to(cols, cp, 0)

    drows, dcols = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, c_valid=c, c_tile=c_tile,
                          r_valid=r, r_tile=rp),
        grid=(cp // c_tile,),
        in_specs=[
            pl.BlockSpec((rp, d), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile, d), lambda ci: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, 1), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, 1), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rp, d), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile, d), lambda ci: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, d), jnp.float32),
            jax.ShapeDtypeStruct((cp, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(rows_p, cols_p, lse_p, g_p)
    return drows[:r], dcols[:c]


def _nce_backward(rows, cols, lse, g, r_tile, c_tile):
    """Backward dispatch: single-sweep fused kernel when the row block fits
    VMEM (one score recompute per tile), else two sweeps — each accumulating
    while its output block index is constant over the inner grid axis (the
    guaranteed-safe revisit-free Pallas accumulation pattern) but paying a
    second score recompute."""
    r, d = rows.shape
    c = cols.shape[0]
    rp = int(np.ceil(r / r_tile)) * r_tile
    cp = int(np.ceil(c / c_tile)) * c_tile
    ct = _fused_bwd_c_tile(max(int(np.ceil(r / 8)) * 8, 8), d, c_tile)
    if ct is not None:
        return _nce_backward_fused(rows, cols, lse, g, ct)
    rows_p = _pad_to(rows, rp, 0)
    cols_p = _pad_to(cols, cp, 0)
    lse_p = _pad_to(lse[:, None], rp, 0)
    g_p = _pad_to(g[:, None], rp, 0)
    kw = dict(c_valid=c, c_tile=c_tile, r_valid=r, r_tile=r_tile)

    drows = pl.pallas_call(
        functools.partial(_bwd_rows_kernel, **kw),
        grid=(rp // r_tile, cp // c_tile),
        in_specs=[
            pl.BlockSpec((r_tile, d), lambda ri, ci: (ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile, d), lambda ri, ci: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, 1), lambda ri, ci: (ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, 1), lambda ri, ci: (ri, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_tile, d), lambda ri, ci: (ri, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, d), jnp.float32),
        interpret=_interpret(),
    )(rows_p, cols_p, lse_p, g_p)

    dcols = pl.pallas_call(
        functools.partial(_bwd_cols_kernel, **kw),
        grid=(cp // c_tile, rp // r_tile),
        in_specs=[
            pl.BlockSpec((r_tile, d), lambda ci, ri: (ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile, d), lambda ci, ri: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, 1), lambda ci, ri: (ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, 1), lambda ci, ri: (ri, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c_tile, d), lambda ci, ri: (ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, d), jnp.float32),
        interpret=_interpret(),
    )(rows_p, cols_p, lse_p, g_p)
    return drows[:r], dcols[:c]


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def nce_lse_rank(rows: jax.Array, cols: jax.Array, targets: jax.Array,
                 r_tile: int = 256, c_tile: int = 512,
                 ks: tuple[int, ...] = (1, 3, 5)):
    """(lse, pos, rank) per row without materialising the score matrix.

    rows ``[R, D]`` f32, cols ``[C, D]`` f32, targets ``[R]`` int32.
    loss = mean(lse − pos); top-k accuracy = mean(rank < k).
    """
    pos = jnp.sum(rows * cols[targets], axis=-1)
    lse, rank = _nce_forward(rows, cols, pos, targets, r_tile, c_tile)
    return lse, pos, rank


def _fwd(rows, cols, targets, r_tile, c_tile, ks):
    pos = jnp.sum(rows * cols[targets], axis=-1)
    lse, rank = _nce_forward(rows, cols, pos, targets, r_tile, c_tile)
    return (lse, pos, rank), (rows, cols, targets, lse)


def _bwd(r_tile, c_tile, ks, res, grads):
    rows, cols, targets, lse = res
    g_lse, g_pos, _ = grads  # rank is integer-valued metric: no gradient
    drows, dcols = _nce_backward(rows, cols, lse, g_lse, r_tile, c_tile)
    # positive-logit term: d(pos_i)/drows_i = cols[t_i], and scatter-add
    # onto dcols at the target columns
    drows = drows + g_pos[:, None] * cols[targets]
    dcols = dcols.at[targets].add(g_pos[:, None] * rows)
    return drows, dcols, None


nce_lse_rank.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def nce_lse_rank_shard(rows: jax.Array, cols: jax.Array, pos: jax.Array,
                       targets: jax.Array, r_tile: int = 256,
                       c_tile: int = 512):
    """Per-candidate-shard flash statistics for the model-parallel NCE.

    Like ``nce_lse_rank`` but over a SLICE of the candidate pool: ``pos``
    (the true positive logit, owned by exactly one model-peer and already
    broadcast) is passed in rather than derived, and ``targets`` holds the
    LOCAL column index of the positive on its owner shard and ``-1``
    elsewhere (so only the owner excludes it from the rank count).
    Returns ``(lse_local, rank_local)``; the caller combines
    ``logsumexp_s(lse_local)`` and ``psum(rank_local)`` across the model
    axis (``ops/sharded_nce.py``).

    The backward uses the LOCAL lse with the incoming cotangent: for
    ``L = f(logsumexp_s lse_s)`` the chain
    ``∂lse_s/∂score_ij · ∂L/∂lse_s = e^{s_ij−lse_s} · e^{lse_s−LSE}·∂L/∂LSE
    = e^{s_ij−LSE}·∂L/∂LSE`` is exactly the global softmax — the combine
    composes with plain AD, no cross-shard state in the kernel.
    """
    lse, rank = _nce_forward(rows, cols, pos, targets, r_tile, c_tile)
    return lse, rank


def _shard_fwd(rows, cols, pos, targets, r_tile, c_tile):
    lse, rank = _nce_forward(rows, cols, pos, targets, r_tile, c_tile)
    return (lse, rank), (rows, cols, lse)


def _shard_bwd(r_tile, c_tile, res, grads):
    rows, cols, lse = res
    g_lse, _ = grads  # rank is an integer-valued metric: no gradient
    drows, dcols = _nce_backward(rows, cols, lse, g_lse, r_tile, c_tile)
    # pos enters only the (non-differentiable) rank count here; its loss
    # term is a plain-JAX gather outside the kernel, handled by AD there
    return drows, dcols, jnp.zeros_like(lse), None


nce_lse_rank_shard.defvjp(_shard_fwd, _shard_bwd)


def fused_nce_loss(pred: jax.Array, gt: jax.Array,
                   targets: jax.Array | None = None,
                   ks: tuple[int, ...] = (1, 3, 5),
                   r_tile: int = 256, c_tile: int = 512
                   ) -> tuple[jax.Array, dict]:
    """Drop-in replacement for ``dense_score`` + ``nce_loss``.

    pred, gt: ``[B, P, S, S, D]`` (gt may have a larger leading batch in
    global-negatives mode).  targets default to the diagonal.
    """
    d = pred.shape[-1]
    rows = pred.reshape(-1, d).astype(jnp.float32)
    cols = gt.reshape(-1, d).astype(jnp.float32)
    if targets is None:
        assert rows.shape[0] == cols.shape[0]
        targets = jnp.arange(rows.shape[0], dtype=jnp.int32)
    lse, pos, rank = nce_lse_rank(rows, cols, targets, r_tile, c_tile, ks)
    loss = jnp.mean(lse - pos)
    metrics = {f"top{k}": jnp.mean((rank < k).astype(jnp.float32))
               for k in ks}
    return loss, metrics
