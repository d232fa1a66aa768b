"""On-device (jit-compiled) clip augmentation.

The reference burns 32 host worker processes on PIL transforms
(``dpc/main.py:311``, SURVEY §7 hard-part 4).  On TPU the cheaper design is:
host workers only decode JPEGs and emit fixed-size uint8 clips; the random
crop / flip / channel-split gray / color jitter / normalisation run inside
the jitted train step on the batch, vectorised over clips on the VPU.

Ops mirror :mod:`dpc_tpu.data.augment` semantics (clip-consistent draws,
per-frame gray/jitter when requested) with one documented deviation:
  * hue jitter rotates RGB about the gray axis (a linear approximation of
    the HSV hue walk — exact HSV is branch-heavy and hostile to the VPU).
Resamples use the host chain's cv2 index math (``_cv2_nearest_idx`` for
NEAREST, 2-tap bilinear for the crop) expressed as separable matmuls —
the MXU form measured 3.1× faster than gather lowering on TPU
(tools/probes/probe_da_levers.py), and the stochastic per-frame ops
(gray pick, the 4-op color jitter) are algebraically fused into
per-frame contractions so the recipe chain is bandwidth- not
gather-bound (round-5 study, docs/RESULTS.md).

Usage: keep the host transform at decode+Scale only, then call
``pretrain_augment(key, clips_uint8)`` inside the step (see
``--device_augment`` in the pretrain driver).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# numpy (not jnp) so importing this module inside a jit trace can never
# capture a tracer in module state
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

# (mean, std, scale) tuples for the stem-conv normalize fold
# (``layers.conv3d_input_norm``): recipes called with normalize_out=False
# emit [0,1] f32 (scale=1) or raw uint8 windows (scale=255) and the model
# applies the affine inside the stem conv — one fewer whole-activation
# traversal per --device_augment step (PARITY.md #14).
INPUT_NORM_01 = (IMAGENET_MEAN, IMAGENET_STD, 1.0)
INPUT_NORM_U8 = (IMAGENET_MEAN, IMAGENET_STD, 255.0)


def resolve_fold(cfg, dense_test: bool = False):
    """Resolve the ``--fold_normalize`` policy (THE single definition —
    the train/eval/test steps all call this) to ``(fold, input_norm)``.

    Dense test (deterministic uint8 recipe): 'auto' folds — measured
    +5.8% on chip, the uint8 windows feed the stem directly
    (``tools/probes/probe_fold.py``).  Stochastic train/val recipes:
    fold only when forced 'on' — XLA already fuses Normalize into the
    jitter chain there and the fold measured −4.3%.  Callers pass the
    recipe ``normalize_out=not fold`` and the model
    ``input_norm=input_norm``.
    """
    if cfg.fold_normalize not in ("auto", "on", "off"):
        raise ValueError("fold_normalize must be one of 'auto'|'on'|'off', "
                         f"got {cfg.fold_normalize!r}")
    if not getattr(cfg, "device_augment", False):
        return False, None
    if dense_test:
        fold = cfg.fold_normalize in ("auto", "on")
        return fold, (INPUT_NORM_U8 if fold else None)
    fold = cfg.fold_normalize == "on"
    return fold, (INPUT_NORM_01 if fold else None)


def device_augment_geometry(dataset: str, img_dim: int,
                            task: str = "pretrain"
                            ) -> tuple[int, tuple[int, int]]:
    """(short_side, window_hw) of the ``--device_augment`` host half —
    THE single source of the recipe geometry (``pretrain.get_dataset``,
    ``evaluate.get_dataset``, ``bench_input`` and ``bench_loop`` all
    route through it, so the benchmarks always measure the window
    production uses).  Mirrors the reference recipes: UCF/HMDB pretrain
    takes the consistent 224-of-240 crop (``dpc/main.py:116-124``); the
    finetune recipes' RandomSizedCrop draws from the WHOLE frame
    (``eval/test.py:121-176``), so ``task='finetune'`` keeps the full
    4:3 geometry at short side 240; the dense-test recipe is
    deterministic, so ``task='test'`` decodes straight to the center
    224² window (``eval/test.py:121-126``) while ``task='test_five'``
    keeps the full geometry the 5 crops are cut from
    (``eval/dataset_3d_lc.py:98-107``); K400 is always a
    native-geometry window the device RandomSizedCrop draws from
    (``dpc/main.py:126-133``)."""
    if dataset == "k400":
        short = 256 if img_dim > 140 else 150
        return short, (short, int(round(short * 4 / 3)))
    if dataset == "synthetic":
        short = max(img_dim, 130)
        if task in ("finetune", "test", "test_five"):
            return short, (short, short)
        return short, (int(round(short * 224 / 240)),) * 2
    if task in ("finetune", "test_five"):
        return 240, (240, 320)
    # pretrain (host takes the consistent 224-of-240 crop) and the
    # deterministic dense test (ROI-decode straight to the center crop)
    # share the 224² window
    return 240, (dense_test_crop(dataset, img_dim),) * 2


def dense_test_crop(dataset: str, img_dim: int) -> int:
    """Spatial crop of the dense-test recipe: the reference's fixed 224
    (``eval/test.py:121-126``); the synthetic set's frames are only
    ``max(img_dim, 130)`` so its recipe center-crops ``img_dim``
    directly (no rescale).  Single source for ``run_test``'s on-device
    ``test_preprocess_batch`` and the window geometry above."""
    return img_dim if dataset == "synthetic" else 224


def _lin_weights(coords: jax.Array, src: int) -> jax.Array:
    """[out, src] 2-tap bilinear sampling matrix for source coordinates
    ``coords`` (border-clamped).  Row i holds weights ``1-frac``/``frac``
    at ``floor(c_i)``/``floor(c_i)+1`` — a banded matrix, but expressing
    the resample as a DENSE matmul is the TPU move: the MXU eats it,
    while the equivalent dynamic gather lowers to serialized row
    loads (measured 2.3x step cost on the finetune recipe,
    tools/probes/probe_ft_da.py)."""
    c = jnp.clip(coords, 0.0, src - 1.0)
    j = jnp.arange(src, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(c[:, None] - j[None, :]))


def random_resized_crop(key: jax.Array, clip: jax.Array, out_size: int,
                        area_range=(0.5, 1.0),
                        aspect_range=(3 / 4, 4 / 3),
                        flip: "jax.Array | None" = None) -> jax.Array:
    """Clip-consistent random area/aspect crop + resize.

    clip: ``[T, H, W, C]`` float or uint8 (converted at the matmul, so a
    uint8 window is never materialized as f32 at full resolution).
    Single-attempt variant (a rejected draw clamps to the frame) —
    statistically close to the reference's 10-attempt loop but
    branch-free for XLA.  Returns f32 in the input's value scale.

    ``flip`` (optional bool scalar): horizontal flip FOLDED into the
    resample — reversing the output rows of the width matrix is
    bit-identical to flipping the result (same per-element multiply-adds)
    but costs a [out,W] select instead of a full-clip reverse+select
    pass (~4.5 ms/batch on the recipe chains, probe_da_levers round-5).
    """
    t, h, w, c = clip.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = jax.random.uniform(k1, (), minval=area_range[0],
                              maxval=area_range[1]) * (h * w)
    log_lo, log_hi = math.log(aspect_range[0]), math.log(aspect_range[1])
    aspect = jnp.exp(jax.random.uniform(k2, (), minval=log_lo,
                                        maxval=log_hi))
    cw = jnp.clip(jnp.sqrt(area * aspect), 8.0, w).astype(jnp.int32)
    ch = jnp.clip(jnp.sqrt(area / aspect), 8.0, h).astype(jnp.int32)
    x0 = jax.random.randint(k3, (), 0, jnp.maximum(w - cw, 0) + 1)
    y0 = jax.random.randint(k4, (), 0, jnp.maximum(h - ch, 0) + 1)
    # crop+resize as one separable interpolation matmul per axis
    xs = x0 + (jnp.arange(out_size) + 0.5) * (cw / out_size) - 0.5
    ys = y0 + (jnp.arange(out_size) + 0.5) * (ch / out_size) - 0.5
    wy = _lin_weights(ys, h)                     # [out, H]
    wx = _lin_weights(xs, w)                     # [out, W]
    if flip is not None:
        wx = jnp.where(flip, wx[::-1], wx)
    # HIGHEST: the weights are exact and the values fit bf16x3, so e.g.
    # the area=1.0 identity draw reproduces the input bit-for-bit
    return jnp.einsum("oh,thwc,pw->topc", wy,
                      clip.astype(jnp.float32), wx,
                      precision=jax.lax.Precision.HIGHEST)


def random_hflip(key: jax.Array, clip: jax.Array) -> jax.Array:
    flip = jax.random.bernoulli(key)
    return jnp.where(flip, clip[:, :, ::-1], clip)


def random_gray(key: jax.Array, clip: jax.Array, p: float = 0.5,
                per_frame: bool = True) -> jax.Array:
    """Channel splitting (reference RandomGray, augmentation.py:224-250).

    The channel pick is a one-hot multiply-reduce, not a
    ``take_along_axis``: same values bit-for-bit (one exact 1.0
    coefficient per output), same isolated cost (3.1 vs 3.1 ms,
    tools/probes/probe_da_levers.py), but the contraction form fuses
    into the surrounding elementwise recipe chain where the dynamic
    gather breaks fusion (chain A/B in docs/RESULTS.md round-5)."""
    t = clip.shape[0]
    shape = (t,) if per_frame else ()
    k1, k2 = jax.random.split(key)
    apply = jax.random.bernoulli(k1, p, shape)
    chan = jax.random.randint(k2, shape, 0, 3)
    # reshape to full rank (leading axis broadcasts over T in the
    # clip-consistent per_frame=False mode)
    w = jax.nn.one_hot(chan, 3, dtype=clip.dtype).reshape((-1, 1, 1, 3))
    gray = jnp.sum(clip * w, axis=-1, keepdims=True)
    return jnp.where(apply.reshape((-1, 1, 1, 1)),
                     jnp.broadcast_to(gray, clip.shape), clip)


def color_jitter(key: jax.Array, clip: jax.Array, brightness=0.5,
                 contrast=0.5, saturation=0.5, hue=0.25,
                 per_frame: bool = True) -> jax.Array:
    """Brightness/contrast/saturation blends + gray-axis hue rotation.
    Operates on [0,1] floats; factors drawn per frame (reference default
    ``consistent=False``)."""
    t = clip.shape[0]
    shape = (t, 1, 1, 1) if per_frame else (1, 1, 1, 1)
    kb, kc, ks, kh = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, shape, minval=max(0, 1 - brightness),
                            maxval=1 + brightness)
    fc = jax.random.uniform(kc, shape, minval=max(0, 1 - contrast),
                            maxval=1 + contrast)
    fs = jax.random.uniform(ks, shape, minval=max(0, 1 - saturation),
                            maxval=1 + saturation)
    fh = jax.random.uniform(kh, shape, minval=-hue, maxval=hue)

    # All four ops are per-pixel AFFINE in the RGB vector with per-frame
    # coefficients, so the chain composes into ONE per-frame 3×3 matrix
    # + scalar bias applied in a single fused pass (the sequential
    # brightness→contrast→saturation→hue form re-reads the clip ~4×;
    # composition measured 1.9× faster isolated (7.8 → 4.1 ms),
    # tools/probes/probe_da_levers.py, pinned vs the sequential op
    # order in tests/test_device_augment.py;
    # values identical up to fp reassociation ≤1e-6):
    #   x1 = fb·x;  lum = L·x1;  m = mean(lum)
    #   x2 = fc·x1 + (1-fc)·m        (contrast)
    #   x3 = fs·x2 + (1-fs)·lum      (saturation)
    #   x4 = R(2π·fh)·x3             (hue: rotation about the gray axis)
    #   ⇒ M = R·(fs·fc·fb·I + (1-fs)·fb·𝟙Lᵀ),  β = fs·(1-fc)·fb·(Lᵀμ)
    # with μ the frame's channel means and R·𝟙 = 𝟙 (gray axis is fixed).
    n = fb.shape[0]
    fb, fc, fs, fh = (f.reshape(n) for f in (fb, fc, fs, fh))
    L = jnp.asarray([0.299, 0.587, 0.114], clip.dtype)
    mu = jnp.mean(clip, axis=(-3, -2))                    # [T, 3]
    m = fb * jnp.sum(mu * L, axis=-1)                     # frame luma mean
    theta = 2.0 * jnp.pi * fh
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    one3 = 1.0 / 3.0
    sq3 = 1.0 / jnp.sqrt(3.0)
    a = cos + (1 - cos) * one3
    bq = one3 * (1 - cos) - sq3 * sin
    cq = one3 * (1 - cos) + sq3 * sin
    R = jnp.stack([jnp.stack([a, bq, cq], -1),
                   jnp.stack([cq, a, bq], -1),
                   jnp.stack([bq, cq, a], -1)], -2)       # [n, 3, 3]
    A = (fs * fc * fb)[:, None, None] * jnp.eye(3, dtype=clip.dtype) \
        + ((1 - fs) * fb)[:, None, None] * (jnp.ones((3, 1), clip.dtype)
                                            * L[None, :])
    # HIGHEST: a [n,3,3] matmul is free, but the DEFAULT TPU precision
    # would round the composed coefficients to bf16 (~4e-3 pixel error
    # vs the sequential chain; with f32 coefficients it is ≤1e-6)
    M = jnp.matmul(R, A, precision=jax.lax.Precision.HIGHEST)
    beta = (fs * (1 - fc) * m)[:, None, None, None]       # [T, 1, 1, 1]
    x = jnp.sum(clip[..., None, :] * M[:, None, None, :, :], axis=-1)
    return jnp.clip(x + beta, 0.0, 1.0)


def normalize(clip: jax.Array) -> jax.Array:
    return (clip - IMAGENET_MEAN) / IMAGENET_STD


def resize_fixed(clip: jax.Array, out_size: int,
                 method: str = "nearest",
                 flip: "jax.Array | None" = None) -> jax.Array:
    """Fixed spatial resize of ``[T, H, W, C]`` to ``out_size``².

    NEAREST by default: the reference's Scale op is NEAREST
    (``utils/augmentation.py:20``) and the interpolation choice visibly
    changes the output noise statistics (bilinear low-passes).

    The nearest path uses cv2 ``INTER_NEAREST`` index math — matching
    the host chain's ``cv2.resize`` (``data/augment.py``) instead of
    ``jax.image.resize``'s rounding — expressed as a separable 0/1
    SELECTION-MATRIX contraction: the MXU eats it at 3.1× the speed of
    the gather forms (8.3 → 2.7 ms on the crop_resize geometry; a
    static-index fancy-index gather is NO faster than jax.image.resize
    — tools/probes/probe_da_levers.py), it is exact (one nonzero per
    output row, pinned == the gather on-device), and the uint8 input is
    converted at the matmul so no full-resolution f32 is materialized.
    Returns f32 in the input's value scale on this path.

    ``flip`` (optional bool scalar, nearest path only): horizontal flip
    folded into the selection matrix — bit-identical to flipping the
    result, at the cost of a [out,W] select instead of a full-clip
    pass (see :func:`random_resized_crop`)."""
    t, h, w, c = clip.shape
    if method == "nearest":
        wy = jnp.asarray((np.arange(h)[None, :] ==
                          _cv2_nearest_idx(out_size, h)[:, None])
                         .astype(np.float32))
        wx = jnp.asarray((np.arange(w)[None, :] ==
                          _cv2_nearest_idx(out_size, w)[:, None])
                         .astype(np.float32))
        if flip is not None:
            wx = jnp.where(flip, wx[::-1], wx)
        # uint8 (and any integer / bf16) values are bf16-exact, so the
        # DEFAULT TPU matmul precision already reproduces the gather
        # bit-for-bit on every in-repo caller; general f32 values would
        # be rounded to bf16 by the MXU, so those take HIGHEST to keep
        # this path's documented exactness
        exact_at_default = (jnp.issubdtype(clip.dtype, jnp.integer)
                            or clip.dtype == jnp.bfloat16)
        return jnp.einsum("oh,thwc,pw->topc", wy,
                          clip.astype(jnp.float32), wx,
                          precision=(None if exact_at_default
                                     else jax.lax.Precision.HIGHEST))
    if flip is not None:
        raise ValueError("flip folding is only supported on the nearest "
                         "(selection-matrix) path")
    return jax.image.resize(clip, (t, out_size, out_size, c), method)


def center_crop_resize(clip: jax.Array, crop_size: int,
                       out_size: int) -> jax.Array:
    """Center-crop ``crop_size``² (clamped to the frame) then NEAREST
    resize to ``out_size``² — the RandomSizedCrop p-miss fallback of the
    finetune/val recipe (``CenterCrop(224)`` → ``Scale(img_dim)``,
    reference ``eval/test.py:121-176``; the reference Scale's default
    interpolation is NEAREST, ``utils/augmentation.py:20``).

    Crop origin uses ``CenterCrop``'s round-half rounding and the resize
    replicates cv2 ``INTER_NEAREST``'s index math, so this path is
    BIT-IDENTICAL to the host chain (both are pure gathers — they
    commute with the uint8→f32 conversion; pinned in
    ``tests/test_device_augment.py``)."""
    t, h, w, c = clip.shape
    ch, cw = min(crop_size, h), min(crop_size, w)
    y0 = int(round((h - ch) / 2.0))
    x0 = int(round((w - cw) / 2.0))
    # uint8-safe: crop + NEAREST are gathers, so the full window is
    # never materialized as f32 (see finetune_augment_batch)
    clip = clip[:, y0:y0 + ch, x0:x0 + cw, :]
    iy = jnp.asarray(_cv2_nearest_idx(out_size, ch))
    ix = jnp.asarray(_cv2_nearest_idx(out_size, cw))
    return clip[:, iy][:, :, ix].astype(jnp.float32)


def _cv2_nearest_idx(out: int, src: int) -> np.ndarray:
    """cv2 ``INTER_NEAREST`` source indices: ``floor(i * src/out)``
    (OpenCV's resizeNN uses ``sx = cvFloor(dx*scale_x)`` — no half-pixel
    centering).  Matching cv2 exactly — not ``jax.image.resize``'s
    rounding — keeps the dense-test device path bit-identical to the
    host transform chain (pinned in tests/test_device_augment.py)."""
    return np.minimum(np.floor(np.arange(out) * (src / out)),
                      src - 1).astype(np.int32)


def test_preprocess_batch(clips: jax.Array, img_dim: int, crop_size: int,
                          five_crop: bool = False,
                          normalize_out: bool = True) -> jax.Array:
    """Device half of the (deterministic) dense-test transform:
    ``CenterCrop(crop_size)`` → ``Scale(img_dim)`` NEAREST → ``Normalize``
    — the reference's test recipe (``eval/test.py:121-126``; 5-crop
    variant ``eval/dataset_3d_lc.py:98-107``) executed inside the jitted
    forward, so host workers only ROI-decode uint8 windows.

    Crop and NEAREST resize are pure gathers, so they commute with the
    uint8→f32 conversion and the device output is bit-identical to the
    host chain (up to Normalize's documented ≤5e-7 fused-op difference,
    PARITY.md).

    clips: ``[R, N, SL, H, W, C]`` uint8.  Returns
    ``[R*K, N, SL, D, D, C]`` f32 with K=5 when ``five_crop`` — each
    input row's crops contiguous, riding the window axis like the host
    FiveCrop path (the caller scales its per-video row counts by K).
    """
    r, n, sl, h, w, c = clips.shape
    flat = clips.reshape(r, n * sl, h, w, c)
    ch, cw = min(crop_size, h), min(crop_size, w)
    if five_crop:  # host FiveCrop's corner order + center rounding
        corners = [(0, 0), (0, w - cw), (h - ch, 0), (h - ch, w - cw),
                   (int(round((h - ch) / 2.0)), int(round((w - cw) / 2.0)))]
    else:  # CenterCrop's rounding
        corners = [(int(round((h - ch) / 2.0)),
                    int(round((w - cw) / 2.0)))]
    iy = jnp.asarray(_cv2_nearest_idx(img_dim, ch))
    ix = jnp.asarray(_cv2_nearest_idx(img_dim, cw))
    outs = []
    for y0, x0 in corners:
        crop = flat[:, :, y0:y0 + ch, x0:x0 + cw, :]
        outs.append(crop[:, :, iy][:, :, :, ix])  # static gathers, uint8
    out = jnp.stack(outs, axis=1)  # [R, K, F, D, D, C]
    if normalize_out:
        out = normalize(out.astype(jnp.float32) / 255.0)
    # else: stay uint8 — the caller folds /255+normalize into the stem
    # conv (INPUT_NORM_U8), so the f32 input is never materialised
    return out.reshape(r * len(corners), n, sl, img_dim, img_dim, c)


def finetune_augment_batch(key: jax.Array, clips: jax.Array, img_dim: int,
                           mode: str = "train",
                           normalize_out: bool = True,
                           sample_keys: "jax.Array | None" = None
                           ) -> jax.Array:
    """Device half of the finetune/probe recipes
    (``augment.finetune_transform``; reference ``eval/test.py:121-176``):

      train: RandomSizedCrop(224, consistent) → Scale(img_dim) → flip →
             ColorJitter(.5,.5,.5,.25, consistent, p=.3) → Normalize
      val:   the same with crop p=.3 (else CenterCrop(224)+Scale) and
             jitter strengths (.2,.2,.2,.1)

    The crop+two-resample chain collapses into ONE bilinear resample to
    ``img_dim`` (crop geometry identical; see PARITY.md).  All draws are
    clip-consistent, matching the reference recipe.  ``clips``:
    ``[B, N, SL, H, W, C]`` uint8 full-geometry windows.

    ``sample_keys`` [b, ...]: caller-supplied per-sample streams — same
    contract as :func:`augment_batch`: clip-sharded model peers slice one
    per-data-group key set so every sample draws the same augmentation
    regardless of how the batch is split across peers.
    """
    b, n, sl, h, w, c = clips.shape
    # stay uint8 until AFTER the crop: the gathers promote to f32 at the
    # cropped resolution, so the full-geometry window is never converted
    # (full-res f32 conversion measured +60% finetune step time,
    # tools/probes/probe_ft_da.py)
    flat = clips.reshape(b, n * sl, h, w, c)
    crop_p = 1.0 if mode == "train" else 0.3
    jb, jc, js, jh = ((0.5, 0.5, 0.5, 0.25) if mode == "train"
                      else (0.2, 0.2, 0.2, 0.1))

    def per_sample(key, clip):
        kp, kc, kf, kq, kj = jax.random.split(key, 5)
        flip = jax.random.bernoulli(kf)   # same draw as random_hflip(kf)
        if crop_p < 1.0:
            # val: the center-crop fallback is a gather chain, so the
            # flip stays a literal post-pass over the blended result
            out = random_resized_crop(kc, clip, img_dim)   # f32, 0..255
            cc = center_crop_resize(clip, 224, img_dim)
            out = jnp.where(jax.random.bernoulli(kp, crop_p), out, cc)
            out = out / 255.0
            out = jnp.where(flip, out[:, :, ::-1], out)
        else:
            # train: fold the flip into the resample matrix (bit-exact,
            # saves the full-clip reverse+select pass — see augment_batch)
            out = random_resized_crop(kc, clip, img_dim, flip=flip) / 255.0
        jit = color_jitter(kj, out, jb, jc, js, jh, per_frame=False)
        out = jnp.where(jax.random.bernoulli(kq, 0.3), jit, out)
        return normalize(out) if normalize_out else out

    keys = jax.random.split(key, b) if sample_keys is None else sample_keys
    out = jax.vmap(per_sample)(keys, flat)
    return out.reshape(b, n, sl, img_dim, img_dim, c)


def augment_batch(key: jax.Array, clips: jax.Array, img_dim: int,
                  gray_p: float = 0.5,
                  recipe: str = "sized_crop",
                  normalize_out: bool = True,
                  sample_keys: "jax.Array | None" = None) -> jax.Array:
    """Jit-free body of :func:`pretrain_augment` — callable from inside an
    already-jitted train step (see ``TrainConfig.device_augment``).

    Recipes (reference ``dpc/main.py:115-133``):
      * ``'sized_crop'`` — K400: random area/aspect crop + resize first
        (host fed an aspect-preserving native-geometry window);
      * ``'crop_resize'`` — UCF/HMDB: the host already took the
        consistent random 224-of-240 crop (pure slicing); the device does
        the resize to ``img_dim``, then flip.  Flip placement relative to
        a uniform random crop is distribution-identical (PARITY.md).
    """
    if recipe not in ("sized_crop", "crop_resize"):
        # validate like resolve_fold does: a typo'd recipe silently
        # running the fixed-resize pipeline trains with wrong augmentation
        raise ValueError(f"unknown device-augment recipe {recipe!r}; "
                         "expected 'sized_crop' or 'crop_resize'")
    b, n, sl, h, w, c = clips.shape
    # uint8 until after the crop/resize (see finetune_augment_batch: the
    # full-geometry window is never converted at full resolution)
    flat = clips.reshape(b, n * sl, h, w, c)

    # ``sample_keys`` [b, ...]: caller-supplied per-sample streams — the
    # clip-sharded model axis slices one per-group key set so each sample
    # draws the same augmentation regardless of how the batch is split
    # across peers (train/pretrain_step.py)

    def per_sample(key, clip):
        kc, kf, kg, kj = jax.random.split(key, 4)
        # flip rides the resample matrix (bit-identical to flipping the
        # resized clip; the separate reverse+select pass measured
        # ~4.5 ms/batch on this chain) — same bernoulli(kf) draw as the
        # standalone random_hflip
        flip = jax.random.bernoulli(kf)
        if recipe == "sized_crop":
            clip = random_resized_crop(kc, clip, img_dim,
                                       flip=flip) / 255.0
        else:
            clip = resize_fixed(clip, img_dim, flip=flip) / 255.0
        clip = random_gray(kg, clip, p=gray_p, per_frame=True)
        clip = color_jitter(kj, clip, per_frame=True)
        return normalize(clip) if normalize_out else clip

    keys = jax.random.split(key, b) if sample_keys is None else sample_keys
    out = jax.vmap(per_sample)(keys, flat)
    return out.reshape(b, n, sl, img_dim, img_dim, c)


@functools.partial(jax.jit, static_argnames=("img_dim", "gray_p", "recipe",
                                             "normalize_out"))
def pretrain_augment(key: jax.Array, clips: jax.Array, img_dim: int,
                     gray_p: float = 0.5,
                     recipe: str = "sized_crop",
                     normalize_out: bool = True) -> jax.Array:
    """Device-side pretrain augmentation as a standalone jit.

    clips: ``[B, N, SL, H, W, C]`` uint8 (decoded, pre-crop size).
    Returns ``[B, N, SL, img_dim, img_dim, C]`` float32 normalised.
    One crop/flip draw per sample (clip-consistent); gray/jitter per frame.
    """
    return augment_batch(key, clips, img_dim, gray_p, recipe, normalize_out)
