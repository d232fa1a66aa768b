"""On-device (jit-compiled) clip augmentation.

The reference burns 32 host worker processes on PIL transforms
(``dpc/main.py:311``, SURVEY §7 hard-part 4).  On TPU the cheaper design is:
host workers only decode JPEGs and emit fixed-size uint8 clips; the random
crop / flip / channel-split gray / color jitter / normalisation run inside
the jitted train step on the batch, vectorised over clips on the VPU.

Ops mirror :mod:`dpc_tpu.data.augment` semantics (clip-consistent draws,
per-frame gray/jitter when requested) with two documented deviations:
  * resize uses bilinear ``jax.image.resize`` (XLA has no NEAREST-short-side
    path worth using; the reference mixes NEAREST/BILINEAR anyway);
  * hue jitter rotates RGB about the gray axis (a linear approximation of
    the HSV hue walk — exact HSV is branch-heavy and hostile to the VPU).

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
                        aspect_range=(3 / 4, 4 / 3)) -> jax.Array:
    """Clip-consistent random area/aspect crop + resize.

    clip: ``[T, H, W, C]`` float or uint8 (converted at the matmul, so a
    uint8 window is never materialized as f32 at full resolution).
    Single-attempt variant (a rejected draw clamps to the frame) —
    statistically close to the reference's 10-attempt loop but
    branch-free for XLA.  Returns f32 in the input's value scale.
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
    """Channel splitting (reference RandomGray, augmentation.py:224-250)."""
    t = clip.shape[0]
    shape = (t,) if per_frame else ()
    k1, k2 = jax.random.split(key)
    apply = jax.random.bernoulli(k1, p, shape)
    chan = jax.random.randint(k2, shape, 0, 3)
    # reshape to full rank (leading axis broadcasts over T in the
    # clip-consistent per_frame=False mode)
    picked = jnp.take_along_axis(
        clip, chan.reshape((-1, 1, 1, 1)), axis=-1)
    gray = jnp.broadcast_to(picked, clip.shape)
    return jnp.where(apply.reshape((-1, 1, 1, 1)), gray, clip)


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

    x = clip * fb                                           # brightness
    lum = (x[..., :1] * 0.299 + x[..., 1:2] * 0.587
           + x[..., 2:3] * 0.114)
    mean = jnp.mean(lum, axis=(-3, -2, -1), keepdims=True)
    x = x * fc + mean * (1 - fc)                            # contrast
    x = x * fs + lum * (1 - fs)                             # saturation
    # hue: rotate about the gray axis by 2π·fh
    theta = 2.0 * jnp.pi * fh
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    one3 = 1.0 / 3.0
    sq3 = 1.0 / jnp.sqrt(3.0)
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    rr = (cos + (1 - cos) * one3) * r \
        + (one3 * (1 - cos) - sq3 * sin) * g \
        + (one3 * (1 - cos) + sq3 * sin) * b
    gg = (one3 * (1 - cos) + sq3 * sin) * r \
        + (cos + one3 * (1 - cos)) * g \
        + (one3 * (1 - cos) - sq3 * sin) * b
    bb = (one3 * (1 - cos) - sq3 * sin) * r \
        + (one3 * (1 - cos) + sq3 * sin) * g \
        + (cos + one3 * (1 - cos)) * b
    x = jnp.concatenate([rr, gg, bb], axis=-1)
    return jnp.clip(x, 0.0, 1.0)


def normalize(clip: jax.Array) -> jax.Array:
    return (clip - IMAGENET_MEAN) / IMAGENET_STD


def resize_fixed(clip: jax.Array, out_size: int,
                 method: str = "nearest") -> jax.Array:
    """Fixed spatial resize of ``[T, H, W, C]`` to ``out_size``².

    NEAREST by default: the reference's Scale op is NEAREST
    (``utils/augmentation.py:20``) and the interpolation choice visibly
    changes the output noise statistics (bilinear low-passes)."""
    t, h, w, c = clip.shape
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
        out = random_resized_crop(kc, clip, img_dim)    # f32, 0..255
        if crop_p < 1.0:
            cc = center_crop_resize(clip, 224, img_dim)
            out = jnp.where(jax.random.bernoulli(kp, crop_p), out, cc)
        out = out / 255.0
        out = random_hflip(kf, out)
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
        if recipe == "sized_crop":
            clip = random_resized_crop(kc, clip, img_dim) / 255.0
        else:
            clip = resize_fixed(clip, img_dim).astype(jnp.float32) / 255.0
        clip = random_hflip(kf, clip)
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
