"""Functional neural-net primitives (channels-last, TPU layouts).

Pure ``init_*``/apply function pairs over explicit param pytrees.  All
video tensors are NDHWC ``[N, T, H, W, C]`` — XLA's preferred layout for
TPU convolutions — in contrast to the reference's NCDHW torch layout.

BatchNorm reproduces both PyTorch semantics the reference relies on:
  * ``track_running_stats=False`` (DPC pretrain, ``dpc/model_3d.py:28``):
    normalise by *batch* statistics always, even in eval;
  * ``track_running_stats=True`` (LC eval, ``eval/model_3d_lc.py:26-28``):
    EMA running stats (momentum 0.1, unbiased var in the EMA, biased var in
    the normalisation — exact torch behaviour), eval uses running stats.
"""

from __future__ import annotations

import warnings
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

CONV3D_DIMNUMS = ("NDHWC", "DHWIO", "NDHWC")
CONV2D_DIMNUMS = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# Initialisers (parity with the reference's policies)
# ---------------------------------------------------------------------------

def kaiming_normal_fan_out(key: jax.Array, shape: tuple[int, ...],
                           dtype=jnp.float32) -> jax.Array:
    """He-normal with fan_out, matching ``nn.init.kaiming_normal_(mode='fan_out')``
    used for every backbone conv (``backbone/resnet_2d3d.py:226``).

    For a conv weight ``[*kernel, in, out]``, fan_out = out · prod(kernel).
    """
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_out = shape[-1] * receptive
    std = float(np.sqrt(2.0 / fan_out))
    return jax.random.normal(key, shape, dtype) * std


def orthogonal_init(key: jax.Array, shape: tuple[int, ...],
                    dtype=jnp.float32) -> jax.Array:
    """Orthogonal init over the (flattened-input, output) matrix view,
    matching ``nn.init.orthogonal_`` on conv weights: torch flattens
    dims 1.. of an OIHW weight, i.e. rows=O, cols=I·prod(k).

    Our layout is ``[*kernel, in, out]`` so the matrix view is
    (out, in·prod(kernel)); we generate torch's matrix then scatter back.
    """
    out_ch = shape[-1]
    fan_in = int(np.prod(shape[:-1]))
    rows, cols = out_ch, fan_in
    big, small = max(rows, cols), min(rows, cols)
    a = jax.random.normal(key, (big, small), jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    if rows < cols:
        q = q.T
    w = q.reshape(out_ch, *shape[:-1])  # torch-style (O, k..., I) view
    # (O, kt.., I) -> (kernel..., I, O)
    perm = tuple(range(1, len(shape))) + (0,)
    return jnp.transpose(w, perm).astype(dtype)


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------

def init_conv3d(key: jax.Array, in_ch: int, out_ch: int,
                kernel: tuple[int, int, int], bias: bool = False,
                init=kaiming_normal_fan_out) -> Params:
    p: Params = {"w": init(key, (*kernel, in_ch, out_ch))}
    if bias:
        p["b"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def conv3d(p: Params, x: jax.Array, stride: tuple[int, int, int],
           padding: tuple[int, int, int], dtype=None) -> jax.Array:
    """3-D convolution, NDHWC × DHWIO.  Explicit symmetric padding matches
    torch's floor-mode output sizes exactly.

    NOTE: folding k_t=1 convs into batched 2-D convs was tried and
    REVERTED — identical math, but the reshape copies broke XLA fusion
    and raised peak HBM by ~600 MB at the R18-128/batch-64 config with no
    step-time win.  XLA tiles the degenerate 3-D convs fine.
    """
    w = p["w"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(padding[0],) * 2, (padding[1],) * 2, (padding[2],) * 2],
        dimension_numbers=CONV3D_DIMNUMS)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def conv3d_input_norm(p: Params, x: jax.Array,
                      stride: tuple[int, int, int],
                      padding: tuple[int, int, int], dtype,
                      input_norm: tuple) -> jax.Array:
    """``conv3d(p, (x/scale − mean)/std)`` computed from the UN-normalised
    ``x`` — the per-channel normalize affine folded into the conv.

    With ``input_norm = (mean, std, scale)``, conv linearity gives
    ``conv(W, x/(s·σ)) − conv(W/(s·σ), s·m·𝟙)`` where ``𝟙`` is ones inside
    the frame and zero in the padding — so the correction term is computed
    by running the SAME scaled weights over a constant mean-field (a
    ``[1, 1, H, W, C]`` conv, ~10⁴× smaller than the batch conv), which
    makes the fold exact at zero-padded borders where a constant bias
    would be wrong.  This removes the full-resolution normalize traversal
    from the --device_augment recipes, and with ``scale=255`` lets uint8
    windows feed the stem directly (uint8 is exact in bf16; the f32 model
    input is never materialised).  Equivalence to normalize-then-conv is
    to rounding: ≤2e-6 relative in f32, ~1e-3 in bf16 (pinned in
    tests/test_device_augment.py); the correction conv runs in f32.
    """
    mean, std, scale = input_norm
    mean = np.asarray(mean, np.float32)
    denom = (np.asarray(std, np.float32) * float(scale))
    w = p["w"] * (1.0 / denom).reshape(1, 1, 1, -1, 1)
    wp = {"w": w}
    if "b" in p:
        wp["b"] = p["b"]
    if dtype is None:
        dtype = w.dtype  # x may be raw uint8; conv needs matching floats
    y = conv3d(wp, x, stride, padding, dtype)
    # stem kernels are temporally 1×/unpadded, so the correction is
    # constant along T and one frame suffices
    assert p["w"].shape[0] == 1 and padding[0] == 0, \
        "input-norm fold needs a temporally-local unpadded stem"
    mf = jnp.broadcast_to(jnp.asarray(mean * float(scale)),
                          (1, 1, x.shape[2], x.shape[3], mean.shape[0]))
    corr = conv3d({"w": w}, mf, stride, padding, jnp.float32)
    return (y - corr.astype(y.dtype))


def init_conv2d(key: jax.Array, in_ch: int, out_ch: int, kernel: int,
                bias: bool = True, init=orthogonal_init) -> Params:
    p: Params = {"w": init(key, (kernel, kernel, in_ch, out_ch))}
    if bias:
        p["b"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def conv2d(p: Params, x: jax.Array, stride: int = 1,
           padding: int = 0, dtype=None) -> jax.Array:
    w = p["w"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding,) * 2, (padding,) * 2],
        dimension_numbers=CONV2D_DIMNUMS)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Normalisation
# ---------------------------------------------------------------------------

def init_batchnorm(ch: int, track_running_stats: bool) -> tuple[Params, Optional[Params]]:
    params = {"scale": jnp.ones((ch,), jnp.float32),
              "bias": jnp.zeros((ch,), jnp.float32)}
    state = ({"mean": jnp.zeros((ch,), jnp.float32),
              "var": jnp.ones((ch,), jnp.float32)}
             if track_running_stats else None)
    return params, state


def _batch_stats(xf: jax.Array, axis_name: Optional[str]
                 ) -> tuple[jax.Array, jax.Array, float]:
    """Batch mean/var over all but the channel axis (+ the element count
    behind them, for Bessel correction), cross-replica via ``pmean``.

    Shared by ``batchnorm`` and ``fused_stem`` — the stats/pmean/count
    semantics MUST stay identical between them or the default TPU stem
    silently diverges from the reference BN it reformulates.  Two-pass
    variance: numerically stable (E[x²]−E[x]² drifts visibly through the
    50+ chained batch-stat BNs of the bottleneck nets)."""
    reduce_axes = tuple(range(xf.ndim - 1))
    mean = jnp.mean(xf, axis=reduce_axes)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
    var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
    if axis_name is not None:
        var = jax.lax.pmean(var, axis_name)
    count = float(np.prod([xf.shape[a] for a in reduce_axes]))
    if axis_name is not None:
        # cross-replica stats pool n_dev× the elements: Bessel
        # correction must use the GLOBAL count
        count *= jax.lax.axis_size(axis_name)
    return mean, var, count


def _ema_update(state: Params, mean: jax.Array, var: jax.Array,
                count: float, momentum: float) -> Params:
    """Running-stats EMA with torch's unbiased-variance convention.
    ``count`` is static (mesh axis sizes are), so the correction is a
    Python-side constant."""
    unbiased = var * (count / max(count - 1.0, 1.0))
    return {"mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased}


def batchnorm(p: Params, state: Optional[Params], x: jax.Array, *,
              train: bool, momentum: float = 0.1, eps: float = 1e-5,
              axis_name: Optional[str] = None
              ) -> tuple[jax.Array, Optional[Params]]:
    """BatchNorm over all axes but the last (channel) axis.

    ``state is None`` ⇒ torch ``track_running_stats=False``: batch stats in
    both train and eval.  Otherwise torch default: train normalises by batch
    stats and EMA-updates running stats (unbiased var in the EMA); eval
    normalises by running stats.  ``axis_name`` enables cross-replica stats
    (an opt-in improvement — the reference's DataParallel BN is per-replica).
    """
    orig_dtype = x.dtype
    # promote (never downcast): bf16 activations normalise in f32, f64
    # parity tests stay f64
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))

    if state is None or train:
        mean, var, count = _batch_stats(xf, axis_name)
        new_state = state
        if state is not None and train:
            new_state = _ema_update(state, mean, var, count, momentum)
    else:
        mean, var = state["mean"], state["var"]
        new_state = state

    inv = jax.lax.rsqrt(var + eps) * p["scale"]
    y = (xf - mean) * inv + p["bias"]
    return y.astype(orig_dtype), new_state


def init_batchnorm1d(ch: int) -> tuple[Params, Params]:
    return init_batchnorm(ch, track_running_stats=True)


# ---------------------------------------------------------------------------
# Pooling / misc
# ---------------------------------------------------------------------------

def maxpool3d(x: jax.Array, kernel: tuple[int, int, int],
              stride: tuple[int, int, int],
              padding: tuple[int, int, int]) -> jax.Array:
    """Max pool over (T, H, W) of NDHWC, torch floor-mode sizes, −inf pads.

    Implemented as an elementwise max over the kernel's shifted strided
    slices rather than ``lax.reduce_window`` — identical result, but with a
    plain reverse-mode rule that composes with ``shard_map`` (reduce_window
    max-grad does not linearise under shard_map as of jax 0.9).  XLA fuses
    the ``prod(kernel)`` maximum ops into one pass.

    NOTE: a separable per-axis decomposition was tried and REVERTED —
    measured ~1.8× SLOWER fwd+bwd on the batch-64 stem pool (55 vs 31 ms
    fwd, 155 vs 85 ms fwd+bwd): XLA fuses the joint 9-way max into a single
    pass over the padded input, while the separable form materialises the
    intermediate pass in HBM.
    """
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    pads = ((0, 0), (padding[0],) * 2, (padding[1],) * 2,
            (padding[2],) * 2, (0, 0))
    xp = jnp.pad(x, pads, constant_values=neg)
    out_sizes = [
        (x.shape[i + 1] + 2 * padding[i] - kernel[i]) // stride[i] + 1
        for i in range(3)]
    result = None
    for dt in range(kernel[0]):
        for dh in range(kernel[1]):
            for dw in range(kernel[2]):
                window = xp[
                    :,
                    dt: dt + (out_sizes[0] - 1) * stride[0] + 1: stride[0],
                    dh: dh + (out_sizes[1] - 1) * stride[1] + 1: stride[1],
                    dw: dw + (out_sizes[2] - 1) * stride[2] + 1: stride[2],
                    :]
                result = window if result is None \
                    else jnp.maximum(result, window)
    return result


def _stem_pool(z: jax.Array) -> jax.Array:
    return maxpool3d(jax.nn.relu(z), (1, 3, 3), (1, 2, 2), (0, 1, 1))


def _stem_pool_rw(z: jax.Array) -> jax.Array:
    """Same pool via ``lax.reduce_window`` — XLA's native window reduction
    reads the input once and was measured 4.8× faster forward than the
    fused slice-chain (5.1 vs 24.2 ms on the batch-64 stem activation).
    Only usable where its gradient is never requested (reduce_window
    max-grad does not linearise under shard_map) — i.e. as the primal of
    the custom-VJP below.
    """
    return jax.lax.reduce_window(
        jax.nn.relu(z), -jnp.inf, jax.lax.max,
        (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
        ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))


@jax.custom_vjp
def _relu_maxpool_eq(z: jax.Array) -> jax.Array:
    return _stem_pool_rw(z)


def _rmp_fwd(z):
    out = _stem_pool_rw(z)
    return out, (z, out)


def _upsample2(x: jax.Array) -> jax.Array:
    """Nearest ×2 over (H, W): up(x)[i, j] = x[i//2, j//2]."""
    n, t, ho, wo, c = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :],
                         (n, t, ho, 2, wo, 2, c))
    return x.reshape(n, t, 2 * ho, 2 * wo, c)


def _shift1(x: jax.Array, axis: int, fill) -> jax.Array:
    """x[..., i, ...] ← x[..., i+1, ...] with ``fill`` at the end."""
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, 1)
    xp = jnp.pad(x, pads, constant_values=fill)
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(1, x.shape[axis] + 1)
    return xp[tuple(idx)]


def _rmp_bwd(res, g):
    """Equality-routed max-pool gradient — one fused elementwise pass.

    XLA's autodiff of the 9-way max chain saves the 8 intermediate maxima
    and replays the select chain — measured 47 ms backward on the batch-64
    stem activation (docs/RESULTS.md).  This routes ``g`` by VALUE: input
    (i, j) receives g[q, r] iff z[i, j] > 0 equals the pooled output of
    window (q, r).  Window geometry (k=3, s=2, p=1) gives each input at
    most 4 candidate windows, rows {i//2, (i+1)//2} × cols {j//2, (j+1)//2}
    — expressed as 4 broadcast-upsampled variants of (out, g), with a
    parity mask killing the duplicate second candidate on even indices.
    Everything is elementwise/broadcast (no strided slices, no
    interleaves), so XLA fuses the whole gradient into one pass over z.

    Tie semantics: a window's gradient goes to EVERY in-window position
    equal to the max (the jnp chain splits fractionally, torch picks one);
    exact ties occur with probability ~0 for continuous activations
    (documented in PARITY.md).
    """
    z, out = res
    neg = jnp.asarray(-jnp.inf, out.dtype)
    zero = jnp.asarray(0, g.dtype)
    o_aa = _upsample2(out)
    g_aa = _upsample2(g)
    o_ba = _shift1(o_aa, 2, neg)      # row candidate (i+1)//2
    g_ba = _shift1(g_aa, 2, zero)
    odd_h = (jax.lax.broadcasted_iota(jnp.int32, (z.shape[2], 1, 1), 0)
             % 2) == 1
    odd_w = (jax.lax.broadcasted_iota(jnp.int32, (z.shape[3], 1), 0)
             % 2) == 1

    variants = (
        (o_aa, g_aa, None),
        (o_ba, g_ba, odd_h),
        (_shift1(o_aa, 3, neg), _shift1(g_aa, 3, zero), odd_w),
        (_shift1(o_ba, 3, neg), _shift1(g_ba, 3, zero), odd_h & odd_w),
    )
    dz = None
    for o_v, g_v, mask in variants:
        hit = (z == o_v) & (z > 0)
        if mask is not None:
            hit = hit & mask
        term = g_v * hit.astype(g_v.dtype)
        dz = term if dz is None else dz + term
    return (dz,)


_relu_maxpool_eq.defvjp(_rmp_fwd, _rmp_bwd)


@jax.custom_vjp
def _relu_maxpool_sas(z: jax.Array) -> jax.Array:
    return _stem_pool_rw(z)


def _rmp_sas_fwd(z):
    return _stem_pool_rw(z), z


def _sas_add(source: jax.Array, operand: jax.Array) -> jax.Array:
    """``select_and_scatter_add`` for the stem's 3×3/s2/p1 window: scatter
    each window's ``source`` value to the FIRST in-window position
    attaining the max of ``operand`` (``ge`` select) — exactly torch's
    argmax-routed maxpool backward.  The one place the private jax
    internal is touched (no public binding exists as of jax 0.9).
    """
    from jax._src.lax import windowed_reductions as _wr
    return _wr._select_and_scatter_add(
        source, operand, jax.lax.ge_p, (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
        ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))


def _probe_sas_available() -> bool:
    """Abstractly evaluate the private ``_select_and_scatter_add`` binding
    once at import: a jax upgrade that renames it or changes its signature
    (it is jax._src internal, last verified on jax 0.9) then degrades the
    stem to the public slice-chain paths with a warning instead of
    breaking training at trace time.
    """
    try:
        jax.eval_shape(
            _sas_add,
            jax.ShapeDtypeStruct((1, 1, 2, 2, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, 4, 4, 1), jnp.float32))
        return True
    except Exception as e:  # noqa: BLE001 — any breakage means "fall back"
        warnings.warn(
            "jax private select_and_scatter_add binding unavailable "
            f"({type(e).__name__}: {e}); stem max-pool falls back to the "
            "slice-chain backward (slower, value-identical; gradient tie "
            "routing per PARITY.md #9).")
        return False


_SAS_AVAILABLE = _probe_sas_available()


def _rmp_sas_bwd(z, g):
    """Max-pool gradient via XLA's native SelectAndScatter primitive.

    First-max tie routing matches the reference (single winner), unlike
    ``_rmp_bwd``'s split-to-all-equal routing.  Measured 1.6× faster than
    the equality route on the batch-64 stem activation (16.3 vs 26.3 ms)
    and with far lower peak memory: the equality route materialises four
    ×2-upsampled variants of (out, g) (~4 × input bytes of HLO temps —
    the largest allocations in the batch-128 OOM dump), while
    SelectAndScatter keeps everything windowed.  Only the *linearisation*
    of reduce_window-max lacks a shard_map rule; binding the scatter
    primitive directly inside a custom VJP composes fine (covered by
    tests).
    """
    dz = _sas_add(g, jax.nn.relu(z))
    return (jnp.where(z > 0, dz, jnp.zeros((), dz.dtype)),)


_relu_maxpool_sas.defvjp(_rmp_sas_fwd, _rmp_sas_bwd)


@jax.custom_vjp
def _maxpool_sas_raw(z: jax.Array) -> jax.Array:
    """3×3/s2/p1 max-pool over (H, W) of NDHWC — no ReLU — with the
    SelectAndScatter backward (first-max tie routing).  Primal of the
    fused stem below; reduce_window's own max-grad has no shard_map rule.
    """
    return jax.lax.reduce_window(
        z, -jnp.inf, jax.lax.max,
        (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
        ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))


def _mps_fwd(z):
    return _maxpool_sas_raw(z), z


def _mps_bwd(z, g):
    return (_sas_add(g, z),)


_maxpool_sas_raw.defvjp(_mps_fwd, _mps_bwd)


def fused_stem(conv_p: Params, bn_p: Params, x: jax.Array, *,
               state: Optional[Params] = None, train: bool = True,
               momentum: float = 0.1,
               stride: tuple[int, int, int] = (1, 2, 2),
               padding: tuple[int, int, int] = (0, 3, 3),
               dtype=None, eps: float = 1e-5,
               axis_name: Optional[str] = None,
               input_norm: Optional[tuple] = None
               ) -> tuple[jax.Array, Optional[Params]]:
    """conv → BN → ReLU → 3×3/s2 max-pool with the normalize deferred to
    POOLED resolution — an exact reformulation that removes the
    full-resolution normalize pass (fwd) and ReLU gate (bwd), the stem's
    two remaining whole-activation traversals.

    ``input_norm=(mean, std, scale)`` additionally folds the INPUT
    normalize affine into the conv (see :func:`conv3d_input_norm`): ``x``
    is then the un-normalised augment output (f32 in [0,1] with scale=1,
    or raw uint8 with scale=255) and the stem computes as if it had been
    normalised — the --device_augment fold.

    Math: with per-channel a = γ·rsqrt(var+ε), b = β − mean·a, the stem is
    ``maxpool(relu(a·x + b))``.  Fold s = (γ ≥ 0 ? +1 : −1) into the conv
    weights so the conv emits x' = s·x; then a·x + b = (s·a)·x' + b with
    s·a ≥ 0, so the map is per-channel MONOTONE in x', and since relu is
    monotone, ``maxpool(relu(s·a·x' + b)) = relu(s·a·maxpool(x') + b)``.
    The true stats are recovered from x': mean = s·mean(x'),
    var(x') = var(x).  ``s`` is never 0 (γ = 0 gets s = +1), so the γ = 0
    channel keeps the exact unfused FORWARD, and its scale gradient
    dL/dγ = Σ g·relu'·(x_sel − mean)·inv stays LIVE (nonzero), which
    matters for recovering pruned/imported channels.  It is a valid
    subgradient that may differ from the unfused form's: at γ = 0 the
    pre-pool activation is constant, every window ties, and the two
    formulations legitimately select different tie winners (s is a
    boolean-derived constant; no gradient flows through it).

    BN modes mirror ``batchnorm`` exactly:
      * ``state is None`` (DPC pretrain, ``dpc/model_3d.py:28``): batch
        stats always, no state;
      * ``state`` given, ``train=True`` (LC finetune): batch stats
        normalise; the EMA update uses the recovered true mean s·mean(x')
        and torch's unbiased variance;
      * ``state`` given, ``train=False`` (LC eval / dense test): running
        stats are CONSTANTS, so the deferred affine costs nothing at all.

    Value parity with the unfused form is exact up to f32/bf16 rounding of
    the reordered affine (asserted in tests/test_maxpool_pallas.py).
    """
    gamma = bn_p["scale"]
    sgn = jnp.where(gamma >= 0, 1.0, -1.0)
    wp = {"w": conv_p["w"] * sgn}
    if "b" in conv_p:
        wp["b"] = conv_p["b"] * sgn
    if input_norm is None:                              # x' = s·x
        xs = conv3d(wp, x, stride, padding, dtype)
    else:
        xs = conv3d_input_norm(wp, x, stride, padding, dtype, input_norm)
    new_state = state
    if state is None or train:
        xf = xs.astype(jnp.promote_types(xs.dtype, jnp.float32))
        # shared stats/EMA core with batchnorm (the only fused_stem
        # twist: the running mean is stored in the ORIGINAL sign
        # convention, sgn·mean_p)
        mean_p, var, count = _batch_stats(xf, axis_name)
        if state is not None and train:
            new_state = _ema_update(state, sgn * mean_p, var, count,
                                    momentum)
        inv = jax.lax.rsqrt(var + eps)
        b = bn_p["bias"] - (sgn * mean_p) * (gamma * inv)   # β − mean·a
    else:  # eval with running stats: the affine is a constant
        inv = jax.lax.rsqrt(state["var"] + eps)
        b = bn_p["bias"] - state["mean"] * (gamma * inv)
    pooled = (_maxpool_sas_raw(xs) if _SAS_AVAILABLE
              else maxpool3d(xs, (1, 3, 3), (1, 2, 2), (0, 1, 1)))
    a_pos = sgn * gamma * inv                 # = |a|, but ∂/∂γ = s·inv ≠ 0
    # promote, never downcast: f64 inputs keep f64 through the affine
    # (batchnorm's rule, layers.py promote_types above)
    y = jax.nn.relu(
        pooled.astype(jnp.promote_types(pooled.dtype, jnp.float32))
        * a_pos + b)
    return y.astype(xs.dtype), new_state


def relu_maxpool_stem(x: jax.Array, impl: str = "auto") -> jax.Array:
    """``maxpool3d(relu(x), (1,3,3), (1,2,2), (0,1,1))`` — the stem's pool
    (reference ``backbone/resnet_2d3d.py:214``).

    ``impl``:
      * "sas" (auto-default on TPU) — XLA ``reduce_window`` forward plus a
        custom VJP binding XLA's native SelectAndScatter for the backward:
        torch-exact first-max tie routing, fastest measured, lowest
        memory (see ``_rmp_sas_bwd``);
      * "eqroute" (even H, W only) — custom VJP that routes gradients by
        value equality against the pooled output (see ``_rmp_bwd``);
        superseded by "sas" but kept as a pure-jnp fallback;
      * "pallas" — fully fused single-read Pallas kernel with argmax
        routing (``ops.maxpool_pallas.maxpool_relu_3x3s2``). Verified
        bit-exact on hardware but measured SLOWER than XLA at the stem
        shape (Mosaic relayouts dominate); kept as the pattern for shapes
        XLA handles worse;
      * "xla" (auto-default elsewhere) — the plain slice-chain form.
    """
    if impl == "auto":
        impl = ("sas" if jax.default_backend() == "tpu" and _SAS_AVAILABLE
                else "xla")
    if impl == "sas":
        if not _SAS_AVAILABLE:  # fail soft (see _probe_sas_available)
            return _stem_pool(x)
        return _relu_maxpool_sas(x)
    if impl == "eqroute":
        return _relu_maxpool_eq(x)
    if impl == "pallas":
        from dpc_tpu.ops import maxpool_pallas
        return maxpool_pallas.maxpool_relu_3x3s2(x)
    return _stem_pool(x)


def init_dense(key: jax.Array, in_ch: int, out_ch: int,
               init=None) -> Params:
    """torch nn.Linear default init: U(−1/√fan_in, 1/√fan_in) for w and b."""
    bound = 1.0 / np.sqrt(in_ch)
    kw, kb = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (in_ch, out_ch), jnp.float32,
                                    -bound, bound),
            "b": jax.random.uniform(kb, (out_ch,), jnp.float32, -bound, bound)}


def dense(p: Params, x: jax.Array) -> jax.Array:
    return jnp.dot(x, p["w"].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype) \
        + p["b"].astype(x.dtype)


def dropout(key: jax.Array, x: jax.Array, rate: float, train: bool) -> jax.Array:
    """Inverted dropout (torch semantics: scale by 1/(1−p) at train time)."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
