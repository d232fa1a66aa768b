"""Fused ReLU + 3×3/stride-2 max-pool as a Pallas TPU kernel.

The backbone stem applies ``maxpool3d(relu(bn(conv(x))))`` to the largest
activation in the network (batch-64 R18-128: 1.3 GB bf16).  XLA's fusion of
the 9-shifted-slice max formulation re-reads that tensor once per window
position forward (~12 GB of HBM traffic) and its autodiff saves the chain
of 8 intermediate maxima for backward — measured 85 ms fwd+bwd out of a
181 ms train step (docs/RESULTS.md round-2 breakdown).

This kernel streams the activation once:
  forward:  one read of z; emits ``relu(maxpool(z))`` (= ``maxpool(relu(z))``
            — ReLU is monotone so it commutes with max) plus a compact
            argmax index (0..8, or 9 when the window max is ≤ 0 and the
            ReLU gate kills the gradient);
  backward: routes ``dout`` to each argmax position with contiguous
            even/odd interleaving (no strided scatter), one write of dz.

Semantics: identical to ``layers.maxpool3d`` + ReLU except on exact ties
inside a window, where this kernel sends the whole gradient to the first
maximal position while jnp's max-chain splits it; ties have measure zero
for real activations.

Specialised to the stem's pool: kernel (1,3,3), stride (1,2,2), padding
(0,1,1), even H and W — the only max-pool in the reference architecture
(``backbone/resnet_2d3d.py:214``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38  # finite -inf stand-in (bf16/f32 safe)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _offsets():
    return [(dh, dw) for dh in range(3) for dw in range(3)]


def _fwd_kernel(z_ref, out_ref, idx_ref):
    """Windows via parity planes — Mosaic has no strided slicing, but a
    stride-2 window grid decomposes into contiguous even/odd planes:
    input row m = 2·o + d − 1, so d=1 reads the even plane at o, d=2 the
    odd plane at o, d=0 the odd plane at o−1 (a shift with −inf fill that
    also realises the padding row)."""
    z = z_ref[:]                                   # [bm, H, W, C]
    bm, h, w, c = z.shape
    ho, wo = h // 2, w // 2
    neg = jnp.asarray(NEG, z.dtype)
    z6 = z.reshape(bm, ho, 2, wo, 2, c)
    planes = {(a, b): z6[:, :, a, :, b, :] for a in (0, 1) for b in (0, 1)}

    def shift_h(x):
        return jnp.concatenate(
            [jnp.full_like(x[:, :1], neg), x[:, :-1]], axis=1)

    def shift_w(x):
        return jnp.concatenate(
            [jnp.full_like(x[:, :, :1], neg), x[:, :, :-1]], axis=2)

    sel = {0: (1, True), 1: (0, False), 2: (1, False)}  # d → (parity, shift)
    best = None
    bidx = None
    for k, (dh, dw) in enumerate(_offsets()):
        (a, sh), (b, sw) = sel[dh], sel[dw]
        win = planes[(a, b)]
        if sh:
            win = shift_h(win)
        if sw:
            win = shift_w(win)
        # 2-D views, f32 compares, arithmetic selects — three Mosaic
        # constraints (as of jax 0.9): no minor-dim-merging reshape, no
        # bf16 vector compare ("Target does not support this comparison"),
        # and no i1 relayout against splat-constant select branches
        # ("Invalid relayout ... vector<...xi1> ... replicated in
        # destination").  The f32 cast happens per 0.25 MB window, not on
        # the whole block, to stay inside the 16 MB scoped-VMEM budget.
        win = win.reshape(bm * ho * wo, c).astype(jnp.float32)
        if best is None:
            best, bidx = win, jnp.zeros(win.shape, jnp.int32)
        else:
            upd = (win > best).astype(jnp.int32)
            bidx = bidx + upd * (k - bidx)
            best = jnp.maximum(win, best)
    dead = (best <= 0).astype(jnp.int32)
    idx = bidx + dead * (9 - bidx)
    out = jnp.maximum(best, jnp.zeros_like(best))
    out_ref[:] = out.reshape(bm, ho, wo, c).astype(out_ref.dtype)
    idx_ref[:] = idx.reshape(bm, ho, wo, c)


def _shift_minus(x: jax.Array, axis: int) -> jax.Array:
    """x[..., i, ...] ← x[..., i+1, ...], zero-filled at the end."""
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, 1)
    xp = jnp.pad(x, pads)
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(1, x.shape[axis] + 1)
    return xp[tuple(idx)]


def _bwd_kernel(dout_ref, idx_ref, ee_ref, eo_ref, oe_ref, oo_ref):
    """Emits dz as four H/W-parity quadrants (dz[2q+a, 2r+b] = q_{ab}[q,r]).

    Input position m maps to window offsets via m = 2·o + d − 1: even m
    receives d=1 at o=m/2; odd m receives d=2 at o=(m−1)/2 plus d=0 at
    o=(m+1)/2 (a backward shift).  Interleaving the quadrants in-kernel
    needs a singleton insert next to the minor dim, which Mosaic cannot
    relayout ("unsupported shape cast") — the cheap 6-D stack+reshape
    assembly happens in XLA outside (``_core_bwd``)."""
    dout = dout_ref[:]                             # [bm, Ho, Wo, C]
    idx = idx_ref[:]
    bm, ho, wo, c = dout.shape
    # select on 2-D views (4-D i1 relayout bug, see _fwd_kernel)
    dout2 = dout.reshape(bm * ho * wo, c)
    idx2 = idx.reshape(bm * ho * wo, c)

    def contrib(k):
        # masked multiply, not select (splat-branch i1 relayout bug)
        return (dout2 * (idx2 == k).astype(dout2.dtype)
                ).reshape(bm, ho, wo, c)

    sh = functools.partial(_shift_minus, axis=1)   # o ← o+1 along Ho
    sw = functools.partial(_shift_minus, axis=2)   # o ← o+1 along Wo
    ee_ref[:] = contrib(4)                         # (dh=1, dw=1)
    eo_ref[:] = contrib(5) + sw(contrib(3))        # (1,2) + (1,0)→
    oe_ref[:] = contrib(7) + sh(contrib(1))        # (2,1) + (0,1)↓
    oo_ref[:] = (contrib(8) + sw(contrib(6))
                 + sh(contrib(2)) + sh(sw(contrib(0))))


def _block_m(h: int, w: int, c: int, itemsize: int, budget: int = 2**20) -> int:
    per_m = h * w * c * itemsize
    return max(1, min(64, budget // max(per_m, 1)))


def maxpool_relu_3x3s2(z: jax.Array) -> jax.Array:
    """``relu(maxpool3d(z, (1,3,3), (1,2,2), (0,1,1)))`` over NDHWC, fused.

    z: ``[N, T, H, W, C]`` with even H, W.  Returns ``[N, T, H/2, W/2, C]``.
    """
    n, t, h, w, c = z.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    out = _pool_core(z.reshape(n * t, h, w, c))
    return out.reshape(n, t, h // 2, w // 2, c)


def _run_fwd(z4: jax.Array) -> tuple[jax.Array, jax.Array]:
    m, h, w, c = z4.shape
    bm = _block_m(h, w, c, z4.dtype.itemsize)
    mp = int(np.ceil(m / bm)) * bm
    if mp != m:
        z4 = jnp.pad(z4, ((0, mp - m), (0, 0), (0, 0), (0, 0)))
    out, idx = pl.pallas_call(
        _fwd_kernel,
        grid=(mp // bm,),
        in_specs=[pl.BlockSpec((bm, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((bm, h // 2, w // 2, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, h // 2, w // 2, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, h // 2, w // 2, c), z4.dtype),
            jax.ShapeDtypeStruct((mp, h // 2, w // 2, c), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=_interpret(),
    )(z4)
    return out[:m], idx[:m]


@jax.custom_vjp
def _pool_core(z4: jax.Array) -> jax.Array:
    out, _ = _run_fwd(z4)
    return out


def _core_fwd(z4):
    out, idx = _run_fwd(z4)
    return out, idx


def _core_bwd(idx, g4):
    m, ho, wo, c = g4.shape
    h, w = 2 * ho, 2 * wo
    bm = _block_m(h, w, c, g4.dtype.itemsize)
    mp = int(np.ceil(m / bm)) * bm
    if mp != m:
        g4 = jnp.pad(g4, ((0, mp - m), (0, 0), (0, 0), (0, 0)))
        idx = jnp.pad(idx, ((0, mp - m), (0, 0), (0, 0), (0, 0)),
                      constant_values=9)
    spec = pl.BlockSpec((bm, ho, wo, c), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    quad_shape = jax.ShapeDtypeStruct((mp, ho, wo, c), g4.dtype)
    ee, eo, oe, oo = pl.pallas_call(
        _bwd_kernel,
        grid=(mp // bm,),
        in_specs=[spec, spec],
        out_specs=[spec, spec, spec, spec],
        out_shape=[quad_shape] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=_interpret(),
    )(g4, idx)
    # parity quadrants → dz[m, 2q+a, 2r+b, c]; XLA does the interleave
    e_rows = jnp.stack([ee, eo], axis=3)           # [m, Ho, Wo, b, C]
    o_rows = jnp.stack([oe, oo], axis=3)
    dz = jnp.stack([e_rows, o_rows], axis=2)       # [m, Ho, a, Wo, b, C]
    return (dz.reshape(mp, h, w, c)[:m],)


_pool_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# Input-resolution equality-routed backward (round-3 VERDICT #1 follow-up)
#
# The SAS backward (layers._rmp_sas_bwd) measures ~14 ms in the batch-64
# stem — 3.5× its ~4 ms bandwidth roofline.  This kernel computes dz in a
# single pass at INPUT resolution with no strided ops anywhere:
#
#   * window maxima are recomputed in VMEM as a stride-1 3×3 max (M3) of
#     the source tile — only its values at even (window-center) positions
#     are consumed;
#   * the output gradient arrives interior-padded to input resolution
#     (one XLA lax.pad: g sits at the even window centers, zeros
#     elsewhere), so the parity masks come FREE from the zeros and the
#     kernel is nine unit-shifted multiply-accumulates:
#       dz[p] = Σ_{δ∈{-1,0,1}²} Gfull[p+δ] · (src[p] == M3[p+δ])
#
# Tie semantics: equality routing (every maximal position receives the
# window's gradient — the documented `eqroute` behaviour, PARITY.md #9),
# unlike SAS's torch-exact first-winner routing.
# ---------------------------------------------------------------------------


def _shift2(x: jax.Array, dh: int, dw: int, fill) -> jax.Array:
    """y[:, i, j, :] = x[:, i+dh, j+dw, :], border-filled (|dh|,|dw| ≤ 1).

    Unit-stride concatenation only — the one window-access pattern Mosaic
    lowers without relayouts.
    """
    if dh == 1:
        x = jnp.concatenate(
            [x[:, 1:], jnp.full_like(x[:, :1], fill)], axis=1)
    elif dh == -1:
        x = jnp.concatenate(
            [jnp.full_like(x[:, :1], fill), x[:, :-1]], axis=1)
    if dw == 1:
        x = jnp.concatenate(
            [x[:, :, 1:], jnp.full_like(x[:, :, :1], fill)], axis=2)
    elif dw == -1:
        x = jnp.concatenate(
            [jnp.full_like(x[:, :, :1], fill), x[:, :, :-1]], axis=2)
    return x


def _bwd_eq_kernel(src_ref, gfull_ref, dsrc_ref):
    src = src_ref[:].astype(jnp.float32)           # [bm, H, W, C]
    gf = gfull_ref[:].astype(jnp.float32)
    m3 = src
    for dh, dw in [(0, 1), (0, -1), (1, 0), (1, -1), (1, 1),
                   (-1, 0), (-1, -1), (-1, 1)]:
        m3 = jnp.maximum(m3, _shift2(src, dh, dw, NEG))
    acc = gf * (src == m3).astype(jnp.float32)     # δ = (0, 0)
    for dh in (-1, 0, 1):
        for dw in (-1, 0, 1):
            if dh == 0 and dw == 0:
                continue
            eq = (src == _shift2(m3, dh, dw, NEG)).astype(jnp.float32)
            acc = acc + _shift2(gf, dh, dw, 0.0) * eq
    dsrc_ref[:] = acc.astype(dsrc_ref.dtype)


def maxpool_bwd_eq(src4: jax.Array, g4: jax.Array) -> jax.Array:
    """dz for 3×3/s2/p1 max-pool over ``[M, H, W, C]`` (even H, W),
    equality-routed.  ``g4``: ``[M, H/2, W/2, C]``."""
    m, h, w, c = src4.shape
    # g at the even window centers, zeros elsewhere: (lo, hi, interior)
    gfull = jax.lax.pad(g4, jnp.zeros((), g4.dtype),
                        ((0, 0, 0), (0, 1, 1), (0, 1, 1), (0, 0, 0)))
    bm = _block_m(h, w, c, 4, budget=2**21)
    mp = int(np.ceil(m / bm)) * bm
    if mp != m:
        src4 = jnp.pad(src4, ((0, mp - m), (0, 0), (0, 0), (0, 0)),
                       constant_values=NEG)
        gfull = jnp.pad(gfull, ((0, mp - m), (0, 0), (0, 0), (0, 0)))
    spec = pl.BlockSpec((bm, h, w, c), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    dsrc = pl.pallas_call(
        _bwd_eq_kernel,
        grid=(mp // bm,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((mp, h, w, c), g4.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=_interpret(),
    )(src4, gfull)
    return dsrc[:m]


@jax.custom_vjp
def maxpool_3x3s2_eq(z: jax.Array) -> jax.Array:
    """3×3/s2/p1 max-pool over NDHWC ``[N, T, H, W, C]`` (even H, W):
    ``lax.reduce_window`` forward (bit-identical values), Pallas
    equality-routed backward in ONE input-resolution pass."""
    return _eq_fwd(z)[0]


def _eq_fwd(z):
    n, t, h, w, c = z.shape
    out = jax.lax.reduce_window(
        z, -jnp.inf, jax.lax.max,
        (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
        [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
    return out, z


def _eq_bwd(z, g):
    n, t, h, w, c = z.shape
    dsrc = maxpool_bwd_eq(z.reshape(n * t, h, w, c),
                          g.reshape(n * t, h // 2, w // 2, c))
    return (dsrc.reshape(z.shape),)


maxpool_3x3s2_eq.defvjp(_eq_fwd, _eq_bwd)
