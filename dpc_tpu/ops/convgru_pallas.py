"""Fused ConvGRU recurrence as a Pallas TPU kernel (kernel_size=1 path).

For the canonical ``kernel_size=1`` aggregator (``dpc/model_3d.py:32-35``)
every gate is a per-spatial-cell dense layer, so one GRU step is two MXU
matmuls plus elementwise gating.  The ``lax.scan`` implementation round-trips
the hidden state through HBM and re-dispatches every step; this kernel runs
the ENTIRE T-step recurrence in one Pallas program per row tile — weights
and the hidden state stay resident in VMEM across steps, x/outputs stream.

Matches ``models.convgru.apply_convgru`` exactly, including per-step
dropout: masks are precomputed outside with the same PRNG chain, so the
fused path is a bit-compatible drop-in (verified in
tests/test_convgru_pallas.py), with a hand-written VJP (the backward
recurrence runs as a reverse ``lax.scan`` of recomputed gates).

Weight layout used here (prepared once per call from the conv params):
  wzr_x [Cin, 2Ch], wzr_h [Ch, 2Ch], b_zr [2Ch]   (update ‖ reset, fused)
  wo_x  [Cin,  Ch], wo_h  [Ch,  Ch], b_o  [Ch]
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = dict[str, Any]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pack_weights(cell: Params) -> tuple[jax.Array, ...]:
    """conv2d gate params (1×1, [1,1,Cin+Ch,Ch]) → dense kernel layout."""
    wz = cell["update"]["w"][0, 0]   # [Cin+Ch, Ch]
    wr = cell["reset"]["w"][0, 0]
    wo = cell["out"]["w"][0, 0]
    ch = wz.shape[1]
    cin = wz.shape[0] - ch
    wzr = jnp.concatenate([wz, wr], axis=1)          # [Cin+Ch, 2Ch]
    return (wzr[:cin], wzr[cin:],
            jnp.concatenate([cell["update"]["b"], cell["reset"]["b"]]),
            wo[:cin], wo[cin:], cell["out"]["b"])


def _gates(x, h, wzr_x, wzr_h, b_zr, wo_x, wo_h, b_o):
    ch = h.shape[-1]
    zr = jax.nn.sigmoid(
        jnp.dot(x, wzr_x, preferred_element_type=jnp.float32)
        + jnp.dot(h, wzr_h, preferred_element_type=jnp.float32) + b_zr)
    z, r = zr[..., :ch], zr[..., ch:]
    o = jnp.tanh(
        jnp.dot(x, wo_x, preferred_element_type=jnp.float32)
        + jnp.dot(h * r, wo_h, preferred_element_type=jnp.float32) + b_o)
    return z, r, o


def _fwd_kernel(x_ref, h0_ref, wzrx_ref, wzrh_ref, bzr_ref, wox_ref,
                woh_ref, bo_ref, mask_ref, out_ref, h_scr, *, t_steps: int):
    h_scr[:] = h0_ref[:].astype(jnp.float32)
    for t in range(t_steps):
        x = x_ref[t].astype(jnp.float32)
        h = h_scr[:]
        z, r, o = _gates(x, h, wzrx_ref[:], wzrh_ref[:], bzr_ref[:],
                         wox_ref[:], woh_ref[:], bo_ref[:])
        h = (h * (1.0 - z) + o * z) * mask_ref[t]
        h_scr[:] = h
        out_ref[t] = h.astype(out_ref.dtype)


def _forward_pallas(x_seq, h0, weights, masks, r_tile: int):
    t, r, cin = x_seq.shape
    ch = h0.shape[-1]
    wzr_x, wzr_h, b_zr, wo_x, wo_h, b_o = weights
    assert r % r_tile == 0, (r, r_tile)
    grid = (r // r_tile,)
    row_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * (len(shape) - 2) + (i, 0),
        memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, t_steps=t),
        grid=grid,
        in_specs=[
            row_spec((t, r_tile, cin)),
            row_spec((r_tile, ch)),
            full((cin, 2 * ch)), full((ch, 2 * ch)), full((1, 2 * ch)),
            full((cin, ch)), full((ch, ch)), full((1, ch)),
            row_spec((t, r_tile, ch)),
        ],
        out_specs=row_spec((t, r_tile, ch)),
        out_shape=jax.ShapeDtypeStruct((t, r, ch), x_seq.dtype),
        scratch_shapes=[pltpu.VMEM((r_tile, ch), jnp.float32)],
        interpret=_interpret(),
    )(x_seq, h0, wzr_x, wzr_h, b_zr[None], wo_x, wo_h, b_o[None], masks)
    return out


# ---------------------------------------------------------------------------
# Custom VJP: manual backward recurrence (reverse scan, recomputed gates)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _fused_core(x_seq, h0, wzr_x, wzr_h, b_zr, wo_x, wo_h, b_o, masks):
    t, r, cin = x_seq.shape
    ch = h0.shape[-1]
    r_tile = _pick_tile(r, t, cin, ch)
    return _forward_pallas(x_seq, h0, (wzr_x, wzr_h, b_zr, wo_x, wo_h,
                                       b_o), masks, r_tile)


def _pick_tile(r: int, t: int, cin: int, ch: int,
               budget_bytes: int = 10 * 2 ** 20) -> int:
    """Largest divisor tile fitting VMEM: the x/mask/out blocks are
    double-buffered by the pipeline, so ≈ 2·t·r_tile·(cin+2ch)·4 bytes."""
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if r % cand == 0 and 2 * t * cand * (cin + 2 * ch) * 4 \
                <= budget_bytes:
            return cand
    return min(r, 8)


def _core_fwd(x_seq, h0, wzr_x, wzr_h, b_zr, wo_x, wo_h, b_o, masks):
    out = _fused_core(x_seq, h0, wzr_x, wzr_h, b_zr, wo_x, wo_h, b_o, masks)
    return out, (x_seq, h0, out, wzr_x, wzr_h, b_zr, wo_x, wo_h, b_o, masks)


# ---------------------------------------------------------------------------
# Pallas backward: reversed recurrence per row tile, gates recomputed in
# VMEM, weight gradients accumulated in resident output blocks
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, h0_ref, out_ref, mask_ref, g_ref, wzrx_ref,
                wzrh_ref, wox_ref, woh_ref, bzr_ref, bo_ref,
                dx_ref, dh0_ref, dwzrx_ref, dwzrh_ref, dbzr_ref,
                dwox_ref, dwoh_ref, dbo_ref, dh_scr, *, t_steps: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dwzrx_ref[:] = jnp.zeros_like(dwzrx_ref)
        dwzrh_ref[:] = jnp.zeros_like(dwzrh_ref)
        dbzr_ref[:] = jnp.zeros_like(dbzr_ref)
        dwox_ref[:] = jnp.zeros_like(dwox_ref)
        dwoh_ref[:] = jnp.zeros_like(dwoh_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)

    f32 = jnp.float32
    contract_last = (((1,), (1,)), ((), ()))   # a @ b.T without transpose
    dh_scr[:] = jnp.zeros_like(dh_scr)
    ch = dh_scr.shape[-1]
    for t in reversed(range(t_steps)):
        x = x_ref[t].astype(f32)
        h_in = (h0_ref[:] if t == 0 else out_ref[t - 1]).astype(f32)
        z, r_, o = _gates(x, h_in, wzrx_ref[:], wzrh_ref[:], bzr_ref[:],
                          wox_ref[:], woh_ref[:], bo_ref[:])
        gh = dh_scr[:] + g_ref[t].astype(f32)
        dh_raw = gh * mask_ref[t]
        dz = dh_raw * (o - h_in)
        do = dh_raw * z
        dh = dh_raw * (1.0 - z)
        dao = do * (1.0 - o * o)
        dhr = jax.lax.dot_general(dao, woh_ref[:], contract_last,
                                  preferred_element_type=f32)
        dh += dhr * r_
        dr = dhr * h_in
        daz = dz * z * (1.0 - z)
        dar = dr * r_ * (1.0 - r_)
        dazr = jnp.concatenate([daz, dar], axis=-1)
        dx_ref[t] = (
            jax.lax.dot_general(dazr, wzrx_ref[:], contract_last,
                                preferred_element_type=f32)
            + jax.lax.dot_general(dao, wox_ref[:], contract_last,
                                  preferred_element_type=f32)
        ).astype(dx_ref.dtype)
        dh += jax.lax.dot_general(dazr, wzrh_ref[:], contract_last,
                                  preferred_element_type=f32)
        dh_scr[:] = dh
        dwzrx_ref[:] += jnp.dot(x.T, dazr, preferred_element_type=f32)
        dwzrh_ref[:] += jnp.dot(h_in.T, dazr, preferred_element_type=f32)
        dbzr_ref[:] += jnp.sum(dazr, 0, keepdims=True)
        dwox_ref[:] += jnp.dot(x.T, dao, preferred_element_type=f32)
        dwoh_ref[:] += jnp.dot((h_in * r_).T, dao,
                               preferred_element_type=f32)
        dbo_ref[:] += jnp.sum(dao, 0, keepdims=True)
    dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)


def _backward_pallas(res, g_out):
    x_seq, h0, h_seq, wzr_x, wzr_h, b_zr, wo_x, wo_h, b_o, masks = res
    t, r, cin = x_seq.shape
    ch = h0.shape[-1]
    r_tile = _pick_tile(r, t, cin, ch, budget_bytes=6 * 2 ** 20)
    grid = (r // r_tile,)
    row = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * (len(shape) - 2) + (i, 0),
        memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                  memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, t_steps=t),
        grid=grid,
        in_specs=[
            row((t, r_tile, cin)), row((r_tile, ch)),
            row((t, r_tile, ch)), row((t, r_tile, ch)),
            row((t, r_tile, ch)),
            full((cin, 2 * ch)), full((ch, 2 * ch)),
            full((cin, ch)), full((ch, ch)),
            full((1, 2 * ch)), full((1, ch)),
        ],
        out_specs=[
            row((t, r_tile, cin)), row((r_tile, ch)),
            full((cin, 2 * ch)), full((ch, 2 * ch)), full((1, 2 * ch)),
            full((cin, ch)), full((ch, ch)), full((1, ch)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, r, cin), x_seq.dtype),
            jax.ShapeDtypeStruct((r, ch), h0.dtype),
            jax.ShapeDtypeStruct((cin, 2 * ch), jnp.float32),
            jax.ShapeDtypeStruct((ch, 2 * ch), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * ch), jnp.float32),
            jax.ShapeDtypeStruct((cin, ch), jnp.float32),
            jax.ShapeDtypeStruct((ch, ch), jnp.float32),
            jax.ShapeDtypeStruct((1, ch), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((r_tile, ch), jnp.float32)],
        interpret=_interpret(),
    )(x_seq, h0, h_seq, masks, g_out, wzr_x, wzr_h, wo_x, wo_h,
      b_zr[None] if b_zr.ndim == 1 else b_zr,
      b_o[None] if b_o.ndim == 1 else b_o)
    dx, dh0, dwzrx, dwzrh, dbzr, dwox, dwoh, dbo = outs
    return (dx, dh0, dwzrx.astype(wzr_x.dtype), dwzrh.astype(wzr_h.dtype),
            dbzr[0].astype(b_zr.dtype), dwox.astype(wo_x.dtype),
            dwoh.astype(wo_h.dtype), dbo[0].astype(b_o.dtype), None)


def _core_bwd(res, g_out):
    return _backward_pallas(res, g_out)


def _core_bwd_jax(res, g_out):
    x_seq, h0, h_seq, wzr_x, wzr_h, b_zr, wo_x, wo_h, b_o, masks = res
    t, r, cin = x_seq.shape
    ch = h0.shape[-1]
    f32 = jnp.float32
    h_prev_seq = jnp.concatenate(
        [h0[None].astype(f32), h_seq[:-1].astype(f32)], axis=0)

    def step(carry, inp):
        dh_next = carry                      # grad wrt h_out of this step
        x, h_in, h_out_grad, mask = inp
        x = x.astype(f32)
        gh = dh_next + h_out_grad.astype(f32)
        z, r_, o = _gates(x, h_in, wzr_x.astype(f32), wzr_h.astype(f32),
                          b_zr.astype(f32), wo_x.astype(f32),
                          wo_h.astype(f32), b_o.astype(f32))
        dh_raw = gh * mask
        dz = dh_raw * (o - h_in)
        do = dh_raw * z
        dh = dh_raw * (1.0 - z)
        dao = do * (1.0 - o * o)
        dhr = jnp.dot(dao, wo_h.astype(f32).T,
                      preferred_element_type=f32)
        dh += dhr * r_
        dr = dhr * h_in
        daz = dz * z * (1.0 - z)
        dar = dr * r_ * (1.0 - r_)
        dazr = jnp.concatenate([daz, dar], axis=-1)
        dx = (jnp.dot(dazr, wzr_x.astype(f32).T, preferred_element_type=f32)
              + jnp.dot(dao, wo_x.astype(f32).T,
                        preferred_element_type=f32))
        dh += jnp.dot(dazr, wzr_h.astype(f32).T, preferred_element_type=f32)
        dwzr_x = jnp.dot(x.T, dazr, preferred_element_type=f32)
        dwzr_h = jnp.dot(h_in.T, dazr, preferred_element_type=f32)
        dwo_x = jnp.dot(x.T, dao, preferred_element_type=f32)
        dwo_h = jnp.dot((h_in * r_).T, dao, preferred_element_type=f32)
        grads = (dwzr_x, dwzr_h, jnp.sum(dazr, 0), dwo_x, dwo_h,
                 jnp.sum(dao, 0))
        return dh, (dx, grads)

    dh0 = jnp.zeros((r, ch), f32)
    dh_last, (dx_seq, gseq) = jax.lax.scan(
        step, dh0,
        (x_seq, h_prev_seq, g_out, masks.astype(f32)), reverse=True)
    wsums = jax.tree.map(lambda a: jnp.sum(a, axis=0), gseq)
    dwzr_x, dwzr_h, db_zr, dwo_x, dwo_h, db_o = wsums
    return (dx_seq.astype(x_seq.dtype), dh_last.astype(h0.dtype),
            dwzr_x.astype(wzr_x.dtype), dwzr_h.astype(wzr_h.dtype),
            db_zr.astype(b_zr.dtype), dwo_x.astype(wo_x.dtype),
            dwo_h.astype(wo_h.dtype), db_o.astype(b_o.dtype), None)


_fused_core.defvjp(_core_fwd, _core_bwd)


def fused_convgru_layer(cell: Params, x: jax.Array, h0: jax.Array, *,
                        dropout: float = 0.0, train: bool = True,
                        key: Optional[jax.Array] = None
                        ) -> tuple[jax.Array, jax.Array]:
    """One ConvGRU layer over a block sequence, fused.

    x: ``[B, T, H, W, Cin]``; h0: ``[B, H, W, Ch]``.
    Returns (outputs ``[B, T, H, W, Ch]``, h_last ``[B, H, W, Ch]``).
    Dropout masks are drawn with the same per-step ``fold_in`` chain as the
    scan implementation, so both paths are numerically identical.
    """
    b, t, hh, ww, cin = x.shape
    ch = h0.shape[-1]
    rows = b * hh * ww
    # [B,T,H,W,C] -> [T, B·H·W, C]; pad rows to a tileable multiple
    # (e.g. R34-224 gives 44·7² = 2156 rows) — padded rows compute garbage
    # that is sliced off, and their cotangents are zero in the backward
    rows_p = max(8, -(-rows // 8) * 8)
    x_seq = jnp.moveaxis(x, 1, 0).reshape(t, rows, cin)
    h0_rows = h0.reshape(rows, ch)
    if rows_p != rows:
        x_seq = jnp.pad(x_seq, ((0, 0), (0, rows_p - rows), (0, 0)))
        h0_rows = jnp.pad(h0_rows, ((0, rows_p - rows), (0, 0)))

    if train and dropout > 0.0 and key is not None:
        keys = jax.random.split(key, t)
        keep = 1.0 - dropout

        def mask_for(k):
            m = jax.random.bernoulli(
                k, keep, (b, hh, ww, ch)).reshape(rows, ch)
            return jnp.where(m, 1.0 / keep, 0.0).astype(jnp.float32)

        masks = jax.vmap(mask_for)(keys)
        if rows_p != rows:
            masks = jnp.pad(masks, ((0, 0), (0, rows_p - rows), (0, 0)),
                            constant_values=1.0)
    else:
        masks = jnp.ones((t, rows_p, ch), jnp.float32)

    weights = pack_weights(cell)
    out = _fused_core(x_seq, h0_rows, *weights, masks)[:, :rows]
    out = jnp.moveaxis(out.reshape(t, b, hh, ww, ch), 0, 1)
    return out, out[:, -1]
