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


def random_resized_crop(key: jax.Array, clip: jax.Array, out_size: int,
                        area_range=(0.5, 1.0),
                        aspect_range=(3 / 4, 4 / 3)) -> jax.Array:
    """Clip-consistent random area/aspect crop + resize.

    clip: ``[T, H, W, C]`` float32.  Single-attempt variant (a rejected
    draw clamps to the frame) — statistically close to the reference's
    10-attempt loop but branch-free for XLA.
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
    # gather-based crop+resize in one step: sample out_size coordinates
    xs = x0 + (jnp.arange(out_size) + 0.5) * (cw / out_size) - 0.5
    ys = y0 + (jnp.arange(out_size) + 0.5) * (ch / out_size) - 0.5
    x_lo = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y_lo = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x_hi = jnp.clip(x_lo + 1, 0, w - 1)
    y_hi = jnp.clip(y_lo + 1, 0, h - 1)
    wx = (xs - x_lo)[None, None, :, None]
    wy = (ys - y_lo)[None, :, None, None]
    g = lambda yi, xi: clip[:, yi][:, :, xi]
    top = g(y_lo, x_lo) * (1 - wx) + g(y_lo, x_hi) * wx
    bot = g(y_hi, x_lo) * (1 - wx) + g(y_hi, x_hi) * wx
    return top * (1 - wy) + bot * wy


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


def augment_batch(key: jax.Array, clips: jax.Array, img_dim: int,
                  gray_p: float = 0.5,
                  recipe: str = "sized_crop") -> jax.Array:
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
    x = clips.astype(jnp.float32) / 255.0
    flat = x.reshape(b, n * sl, h, w, c)

    def per_sample(key, clip):
        kc, kf, kg, kj = jax.random.split(key, 4)
        if recipe == "sized_crop":
            clip = random_resized_crop(kc, clip, img_dim)
        else:
            clip = resize_fixed(clip, img_dim)
        clip = random_hflip(kf, clip)
        clip = random_gray(kg, clip, p=gray_p, per_frame=True)
        clip = color_jitter(kj, clip, per_frame=True)
        return normalize(clip)

    keys = jax.random.split(key, b)
    out = jax.vmap(per_sample)(keys, flat)
    return out.reshape(b, n, sl, img_dim, img_dim, c)


@functools.partial(jax.jit, static_argnames=("img_dim", "gray_p", "recipe"))
def pretrain_augment(key: jax.Array, clips: jax.Array, img_dim: int,
                     gray_p: float = 0.5,
                     recipe: str = "sized_crop") -> jax.Array:
    """Device-side pretrain augmentation as a standalone jit.

    clips: ``[B, N, SL, H, W, C]`` uint8 (decoded, pre-crop size).
    Returns ``[B, N, SL, img_dim, img_dim, C]`` float32 normalised.
    One crop/flip draw per sample (clip-consistent); gray/jitter per frame.
    """
    return augment_batch(key, clips, img_dim, gray_p, recipe)
