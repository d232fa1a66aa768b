"""Video-consistent augmentation stack (host side).

Re-design of the reference augmentations (``utils/augmentation.py``): every
op maps a whole clip — here a numpy uint8 array ``[T, H, W, C]`` instead of
a list of PIL images — with a ``consistent`` flag choosing one random draw
for the clip vs per-frame draws.  All randomness flows through an explicit
``np.random.Generator`` (the reference uses the global ``random`` module,
which is neither seedable per-sample nor worker-safe).

Semantics matched op-by-op:
  * Scale: aspect-preserving short-side resize, NEAREST default (``:20-42``);
  * CenterCrop (``:45``), RandomCrop (``:99``), RandomCropWithProb (``:61``);
  * RandomSizedCrop: area ∈ [0.5, 1], aspect ∈ [3/4, 4/3], 10 attempts,
    fallback Scale+CenterCrop, p-gated else CenterCrop (``:144-195``),
    BILINEAR;
  * RandomHorizontalFlip with 'left'/'right' force commands (``:198``);
  * RandomGray — channel *splitting*: one RGB channel replicated ×3
    (``:224-250``, per-frame when consistent=False);
  * ColorJitter: brightness/contrast/saturation/hue with torchvision factor
    ranges, applied in a random order, p-gated, per-frame when
    consistent=False (``:253-342``);
  * RandomRotation ±deg with canvas expansion (``:353-366``);
  * Normalize: ToTensor(÷255) + ImageNet mean/std (``:368-379``).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_INTERP = {"nearest": cv2.INTER_NEAREST, "bilinear": cv2.INTER_LINEAR}


def _resize_clip(clip: np.ndarray, size_wh: tuple[int, int],
                 interpolation: str) -> np.ndarray:
    flag = _INTERP[interpolation]
    return np.stack([cv2.resize(f, size_wh, interpolation=flag)
                     for f in clip])


def frame_consistent(transform) -> bool:
    """True when the transform applies the SAME mapping to every frame of
    a clip — every random draw is per-clip (``consistent=True``) or the op
    is deterministic — so the output for one frame does not depend on how
    many frames ride along.  This is the precondition for the dense-test
    decode-each-frame-once path (``video_dataset.FrameClipDataset.sample``):
    overlapping windows can then share one decoded+transformed copy of each
    unique frame, exactly as the reference slices its pre-transformed
    tensor (``eval/dataset_3d_lc.py:95,109-125``).

    Classification is closed-world and conservative: the module's
    deterministic ops are whitelisted, random ops report their own
    ``consistent`` flag, and containers/wrappers (Compose, PerCrop,
    HostScaleCrop) recurse into their children — so a per-frame-random op
    nested inside a wrapper can't be misclassified.  Anything
    unrecognised returns False: an unknown op disables the dedupe
    (correct, just slower) rather than silently sharing one random draw
    across window occurrences."""
    if isinstance(transform, Compose):
        return all(frame_consistent(op) for op in transform.ops)
    if isinstance(transform, PerCrop):
        return frame_consistent(transform.op)
    if isinstance(transform, HostScaleCrop):
        return all(frame_consistent(op) for op in (
            transform._scale, transform._pad, transform._crop))
    if hasattr(transform, "consistent"):
        return bool(transform.consistent)
    return isinstance(transform,
                      (Padding, Scale, CenterCrop, FiveCrop, PadTo,
                       Normalize))


class Compose:
    def __init__(self, ops: Sequence):
        self.ops = list(ops)

    def __call__(self, clip: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng or np.random.default_rng()
        for op in self.ops:
            clip = op(clip, rng)
        return clip


class Padding:
    def __init__(self, pad: int):
        self.pad = pad

    def __call__(self, clip, rng):
        p = self.pad
        return np.pad(clip, ((0, 0), (p, p), (p, p), (0, 0)))


def shortside_dims(h: int, w: int, s: int) -> tuple[int, int]:
    """Output (h, w) of a short-side-``s`` aspect-preserving resize.

    THE geometry contract of the split pipeline: ``Scale``,
    ``HostScaleCrop.plan`` and the native decoder's ``shortside_dims``
    (``native/jpeg_decoder.cpp``) must all agree — the planned crop
    window is computed against these dims, and a mismatch makes the
    native ROI decode reject every frame (rc=2) and silently degrade to
    the slow fallback.  Torchvision truncation semantics (int(), not
    round()), matching the reference's ``Scale`` (``utils/augmentation.py``).
    """
    if (w <= h and w == s) or (h <= w and h == s):
        return h, w
    if w < h:
        return int(s * h / w), s
    return s, int(s * w / h)


class Scale:
    """Short-side resize (int size) or fixed (w, h) resize."""

    def __init__(self, size, interpolation: str = "nearest"):
        self.size = size
        self.interpolation = interpolation

    def __call__(self, clip, rng):
        t, h, w, c = clip.shape
        if isinstance(self.size, int):
            oh, ow = shortside_dims(h, w, self.size)
            if (oh, ow) == (h, w):
                return clip
            return _resize_clip(clip, (ow, oh), self.interpolation)
        return _resize_clip(clip, tuple(self.size), self.interpolation)


def _crop(clip, y, x, th, tw):
    return clip[:, y: y + th, x: x + tw]


class CenterCrop:
    def __init__(self, size, consistent: bool = True):
        self.size = (size, size) if isinstance(size, (int, float)) else size

    def __call__(self, clip, rng):
        t, h, w, c = clip.shape
        th, tw = self.size
        x1 = int(round((w - tw) / 2.0))
        y1 = int(round((h - th) / 2.0))
        return _crop(clip, y1, x1, th, tw)


class RandomCrop:
    """Random crop; optional optical-flow-guided proposals (the reference's
    3-proposal largest-|flow| mode, ``augmentation.py:126-137``)."""

    def __init__(self, size, consistent: bool = True, num_proposals: int = 3):
        self.size = (size, size) if isinstance(size, (int, float)) else size
        self.consistent = consistent
        self.num_proposals = num_proposals

    def __call__(self, clip, rng, flowmap=None):
        t, h, w, c = clip.shape
        th, tw = self.size
        if w == tw and h == th:
            return clip
        if flowmap is not None:
            assert not self.consistent
            out = np.empty((t, th, tw, c), clip.dtype)
            for i in range(t):
                best, best_mag = (0, 0), -1.0
                for _ in range(self.num_proposals):
                    x = int(rng.integers(0, w - tw + 1))
                    y = int(rng.integers(0, h - th + 1))
                    mag = abs(float(
                        np.mean(flowmap[i, y: y + th, x: x + tw])))
                    if mag > best_mag:
                        best, best_mag = (y, x), mag
                out[i] = clip[i, best[0]: best[0] + th,
                              best[1]: best[1] + tw]
            return out
        if self.consistent:
            x1 = int(rng.integers(0, w - tw + 1))
            y1 = int(rng.integers(0, h - th + 1))
            return _crop(clip, y1, x1, th, tw)
        out = np.empty((t, th, tw, c), clip.dtype)
        for i in range(t):
            x1 = int(rng.integers(0, w - tw + 1))
            y1 = int(rng.integers(0, h - th + 1))
            out[i] = clip[i, y1: y1 + th, x1: x1 + tw]
        return out


class FiveCrop:
    """Four corners + centre → ``[5, T, size, size, C]`` (the eval
    dataset's 5-crop test path, ``eval/dataset_3d_lc.py:98-107``)."""

    def __init__(self, size):
        self.size = (size, size) if isinstance(size, (int, float)) else size

    def __call__(self, clip, rng=None):
        t, h, w, c = clip.shape
        th, tw = self.size
        assert th <= h and tw <= w, (clip.shape, self.size)
        cx = int(round((w - tw) / 2.0))
        cy = int(round((h - th) / 2.0))
        corners = [(0, 0), (0, w - tw), (h - th, 0), (h - th, w - tw),
                   (cy, cx)]
        return np.stack([_crop(clip, y, x, th, tw) for y, x in corners])


class PadTo:
    """Reflect-pad so the clip is at least (min_h, min_w) — a safety net
    ahead of fixed-size crops for odd-aspect (portrait) videos."""

    def __init__(self, min_h: int, min_w: int):
        self.min_h, self.min_w = min_h, min_w

    def __call__(self, clip, rng=None):
        t, h, w, c = clip.shape
        ph, pw = max(0, self.min_h - h), max(0, self.min_w - w)
        if not (ph or pw):
            return clip
        return np.pad(clip, ((0, 0), (ph // 2, ph - ph // 2),
                             (pw // 2, pw - pw // 2), (0, 0)),
                      mode="reflect")


class PerCrop:
    """Apply an op to each crop of a multi-crop ``[K, T, H, W, C]`` clip
    (ops downstream of :class:`FiveCrop` in a recipe)."""

    def __init__(self, op):
        self.op = op

    def __call__(self, clip, rng=None):
        if clip.ndim == 4:
            return self.op(clip, rng)
        return np.stack([self.op(c, rng) for c in clip])


class RandomCropWithProb:
    def __init__(self, size, p: float = 0.8, consistent: bool = True):
        self.size = (size, size) if isinstance(size, (int, float)) else size
        self.p = p
        self.consistent = consistent

    def __call__(self, clip, rng):
        t, h, w, c = clip.shape
        th, tw = self.size
        if w == tw and h == th:
            return clip

        def corner():
            if rng.random() < self.p:
                return (int(rng.integers(0, w - tw + 1)),
                        int(rng.integers(0, h - th + 1)))
            return (int(round((w - tw) / 2.0)), int(round((h - th) / 2.0)))

        if self.consistent:
            x1, y1 = corner()
            return _crop(clip, y1, x1, th, tw)
        out = np.empty((t, th, tw, c), clip.dtype)
        for i in range(t):
            x1, y1 = corner()
            out[i] = clip[i, y1: y1 + th, x1: x1 + tw]
        return out


class RandomSizedCrop:
    def __init__(self, size: int, interpolation: str = "bilinear",
                 consistent: bool = True, p: float = 1.0,
                 area_range: tuple[float, float] = (0.5, 1.0),
                 aspect_range: tuple[float, float] = (3 / 4, 4 / 3)):
        self.size = size
        self.interpolation = interpolation
        self.consistent = consistent
        self.p = p
        self.area_range = area_range
        self.aspect_range = aspect_range

    def __call__(self, clip, rng):
        t, hh, ww, c = clip.shape
        if rng.random() >= self.p:
            return CenterCrop(self.size)(clip, rng)
        for _ in range(10):
            area = ww * hh
            target_area = rng.uniform(*self.area_range) * area
            aspect = rng.uniform(*self.aspect_range)
            w = int(round(math.sqrt(target_area * aspect)))
            h = int(round(math.sqrt(target_area / aspect)))
            if self.consistent:
                if rng.random() < 0.5:
                    w, h = h, w
                if w <= ww and h <= hh:
                    x1 = int(rng.integers(0, ww - w + 1))
                    y1 = int(rng.integers(0, hh - h + 1))
                    cropped = _crop(clip, y1, x1, h, w)
                    return _resize_clip(cropped, (self.size, self.size),
                                        self.interpolation)
            else:
                frames = []
                for i in range(t):
                    wi, hi = (h, w) if rng.random() < 0.5 else (w, h)
                    if wi <= ww and hi <= hh:
                        x1 = int(rng.integers(0, ww - wi + 1))
                        y1 = int(rng.integers(0, hh - hi + 1))
                        frames.append(clip[i, y1: y1 + hi, x1: x1 + wi])
                    else:
                        frames.append(clip[i])
                return np.stack([
                    cv2.resize(f, (self.size, self.size),
                               interpolation=_INTERP[self.interpolation])
                    for f in frames])
        # fallback: short-side scale then center crop (reference :189-192)
        scaled = Scale(self.size, self.interpolation)(clip, rng)
        return CenterCrop(self.size)(scaled, rng)


class RandomHorizontalFlip:
    def __init__(self, consistent: bool = True,
                 command: Optional[str] = None):
        self.consistent = consistent
        self.p = {"left": 0.0, "right": 1.0}.get(command, 0.5)

    def __call__(self, clip, rng):
        if self.consistent:
            return clip[:, :, ::-1] if rng.random() < self.p else clip
        flips = rng.random(clip.shape[0]) < self.p
        out = clip.copy()
        out[flips] = out[flips, :, ::-1]
        return out


class RandomGray:
    """Channel splitting: replace RGB with one channel replicated ×3."""

    def __init__(self, consistent: bool = True, p: float = 0.5):
        self.consistent = consistent
        self.p = p

    def __call__(self, clip, rng):
        t = clip.shape[0]
        if self.consistent:
            if rng.random() < self.p:
                ch = int(rng.integers(0, 3))
                return np.repeat(clip[..., ch: ch + 1], 3, axis=-1)
            return clip
        out = clip.copy()
        for i in range(t):
            if rng.random() < self.p:
                ch = int(rng.integers(0, 3))
                out[i] = np.repeat(clip[i, ..., ch: ch + 1], 3, axis=-1)
        return out


def _grayscale(img: np.ndarray) -> np.ndarray:
    # ITU-R 601-2 luma, matching PIL convert('L') / torchvision
    g = (img[..., 0] * 0.299 + img[..., 1] * 0.587
         + img[..., 2] * 0.114).astype(np.uint8)
    return g[..., None]


def _blend_lut(factor: float, other: float) -> np.ndarray:
    """256-entry uint8 lookup table for torchvision's blend
    ``clip(v·factor + other·(1−factor))`` with a scalar ``other`` —
    bit-identical to the float32 per-pixel formula because the identical
    computation runs once per 8-bit value."""
    v = np.arange(256, dtype=np.float32)
    return np.clip(v * factor + np.float32(other) * (1.0 - factor),
                   0, 255).astype(np.uint8)


def _apply_lut(img: np.ndarray, lut: np.ndarray) -> np.ndarray:
    if img.ndim == 3:
        return cv2.LUT(img, lut)
    return lut[img]


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    return _apply_lut(img, _blend_lut(factor, 0.0))


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    mean = int(_grayscale(img).mean() + 0.5)
    return _apply_lut(img, _blend_lut(factor, float(mean)))


def adjust_saturation(img: np.ndarray, factor: float) -> np.ndarray:
    # gray stays [H, W, 1]: broadcasting in the arithmetic avoids
    # materialising a 3-channel float copy of the gray image
    out = img.astype(np.float32)
    out *= factor
    out += _grayscale(img).astype(np.float32) * (1.0 - factor)
    return np.clip(out, 0, 255).astype(np.uint8)


def adjust_hue(img: np.ndarray, factor: float) -> np.ndarray:
    """Shift the hue wheel by ``factor`` ∈ [−0.5, 0.5] (8-bit wrap, the
    PIL/torchvision uint8 semantics)."""
    shift = int(round(factor * 255))
    if shift == 0:
        return img  # uint8 HSV roundtrip is lossy; zero shift is identity
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV_FULL)
    hsv[..., 0] = (hsv[..., 0].astype(np.int16) + shift).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB_FULL)


class ColorJitter:
    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0,
                 hue=0.0, consistent: bool = False, p: float = 1.0):
        self.brightness = self._range(brightness)
        self.contrast = self._range(contrast)
        self.saturation = self._range(saturation)
        self.hue = self._range(hue, center=0.0, clip_zero=False)
        self.consistent = consistent
        self.p = p

    @staticmethod
    def _range(v, center: float = 1.0, clip_zero: bool = True):
        if isinstance(v, (tuple, list)):
            lo, hi = v
        else:
            lo, hi = center - v, center + v
            if clip_zero:
                lo = max(lo, 0.0)
        return None if lo == hi == center else (lo, hi)

    def _params(self, rng):
        ops = []
        if self.brightness is not None:
            f = rng.uniform(*self.brightness)
            ops.append(lambda im, f=f: adjust_brightness(im, f))
        if self.contrast is not None:
            f = rng.uniform(*self.contrast)
            ops.append(lambda im, f=f: adjust_contrast(im, f))
        if self.saturation is not None:
            f = rng.uniform(*self.saturation)
            ops.append(lambda im, f=f: adjust_saturation(im, f))
        if self.hue is not None:
            f = rng.uniform(*self.hue)
            ops.append(lambda im, f=f: adjust_hue(im, f))
        rng.shuffle(ops)
        return ops

    def __call__(self, clip, rng):
        if rng.random() >= self.p:
            return clip
        if self.consistent:
            ops = self._params(rng)
            out = np.empty_like(clip)
            for i in range(clip.shape[0]):
                f = clip[i]
                for op in ops:
                    f = op(f)
                out[i] = f
            return out
        out = np.empty_like(clip)
        for i in range(clip.shape[0]):
            f = clip[i]
            for op in self._params(rng):
                f = op(f)
            out[i] = f
        return out


class RandomRotation:
    def __init__(self, consistent: bool = True, degree: float = 15,
                 p: float = 1.0):
        self.consistent = consistent
        self.degree = degree
        self.p = p

    @staticmethod
    def _rotate_expand(img: np.ndarray, deg: float) -> np.ndarray:
        h, w = img.shape[:2]
        m = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
        cos, sin = abs(m[0, 0]), abs(m[0, 1])
        nw = int(h * sin + w * cos)
        nh = int(h * cos + w * sin)
        m[0, 2] += (nw - w) / 2
        m[1, 2] += (nh - h) / 2
        return cv2.warpAffine(img, m, (nw, nh))

    def __call__(self, clip, rng):
        if rng.random() >= self.p:
            return clip
        if self.consistent:
            deg = float(rng.integers(-self.degree, self.degree))
            return np.stack([self._rotate_expand(f, deg) for f in clip])
        # per-frame degrees expand to DIFFERENT canvas sizes (the
        # reference returns a ragged list of PIL images,
        # utils/augmentation.py:364); an array pipeline needs one shape,
        # so centre each expanded frame on the common max canvas
        # (PARITY.md #16 — the op is unused by every recipe)
        frames = [self._rotate_expand(f, float(rng.integers(-self.degree,
                                                            self.degree)))
                  for f in clip]
        hm = max(f.shape[0] for f in frames)
        wm = max(f.shape[1] for f in frames)
        out = np.zeros((len(frames), hm, wm) + clip.shape[3:],
                       dtype=clip.dtype)
        for i, f in enumerate(frames):
            y0 = (hm - f.shape[0]) // 2
            x0 = (wm - f.shape[1]) // 2
            out[i, y0:y0 + f.shape[0], x0:x0 + f.shape[1]] = f
        return out


class Normalize:
    """uint8 [T,H,W,C] → float32 normalised (ToTensor ÷255 + mean/std).

    Computed as one fused per-channel scale+offset via ``cv2.transform``
    (a single SIMD pass, ~4× faster than the chained numpy expression);
    differs from the literal ((x/255 − mean)/std) by ≤5e-7 — see
    PARITY.md.
    """

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        n = len(self.mean)
        m = np.zeros((n, n + 1), np.float64)
        m[np.arange(n), np.arange(n)] = 1.0 / (255.0 * self.std)
        m[:, n] = -self.mean / self.std
        self._m = m.astype(np.float32)

    def __call__(self, clip, rng=None):
        c = clip.shape[-1]
        if clip.ndim >= 3 and c == len(self.mean) and 1 <= c <= 4:
            flat = np.ascontiguousarray(clip).reshape(
                -1, clip.shape[-2], c)
            return cv2.transform(flat.astype(np.float32),
                                 self._m).reshape(clip.shape)
        return (clip.astype(np.float32) / 255.0 - self.mean) / self.std


# ---------------------------------------------------------------------------
# Canonical recipes (dpc/main.py:115-133, eval/test.py:121-126,161-176)
# ---------------------------------------------------------------------------

class HostScaleCrop:
    """The host half of the ``--device_augment`` split pipeline —
    ``Scale(short)`` → ``PadTo(win)`` → ``RandomCrop(win, consistent)`` —
    expressed as ONE op the native JPEG decoder can execute inside the
    entropy decode (``native.decode_jpeg_batch_scale_crop``: DCT-domain
    scaling + ``jpeg_crop_scanline``/``jpeg_skip_scanlines`` ROI decode,
    so only the pixels feeding the window are ever IDCT'd).

    :meth:`plan` returns the (short_side, crop) the decoder needs, drawing
    the window with the same rng calls as ``RandomCrop`` (x then y), or
    ``None`` when the scaled frame is smaller than the window (portrait
    sources needing reflect-pad — the numpy fallback handles those).  The
    ``__call__`` fallback runs the same geometry on decoded frames
    (bilinear scale, matching the native path's resampler).

    ``center=True`` places the window at the frame center with
    ``CenterCrop``'s rounding (the deterministic dense-test host half:
    the decoder IDCTs only the center window the test recipe keeps).
    """

    def __init__(self, short: int, win_hw: tuple[int, int],
                 center: bool = False):
        self.short = short
        self.win_h, self.win_w = win_hw
        self.center = center
        self._scale = Scale(short, interpolation="bilinear")
        self._pad = PadTo(*win_hw)
        self._crop = (CenterCrop(win_hw) if center
                      else RandomCrop(win_hw, consistent=True))

    def scaled_dims(self, h: int, w: int) -> tuple[int, int]:
        return shortside_dims(h, w, self.short)

    def plan(self, src_hw: tuple[int, int], rng
             ) -> "tuple[int, tuple[int, int, int, int]] | None":
        oh, ow = self.scaled_dims(*src_hw)
        if oh < self.win_h or ow < self.win_w:
            return None  # needs padding: numpy fallback
        if self.center:  # CenterCrop's rounding (round-half-even)
            x1 = int(round((ow - self.win_w) / 2.0))
            y1 = int(round((oh - self.win_h) / 2.0))
        else:
            x1 = int(rng.integers(0, ow - self.win_w + 1))
            y1 = int(rng.integers(0, oh - self.win_h + 1))
        return self.short, (y1, x1, self.win_h, self.win_w)

    def __call__(self, clip, rng):
        clip = self._scale(clip, rng)
        clip = self._pad(clip, rng)
        return self._crop(clip, rng)


def pretrain_transform(dataset: str, img_dim: int) -> Compose:
    if dataset in ("ucf101", "hmdb51", "synthetic"):
        return Compose([
            RandomHorizontalFlip(consistent=True),
            RandomCrop(size=224, consistent=True),
            Scale(size=(img_dim, img_dim)),
            RandomGray(consistent=False, p=0.5),
            ColorJitter(0.5, 0.5, 0.5, 0.25, consistent=False, p=1.0),
            Normalize(),
        ])
    if dataset == "k400":
        return Compose([
            RandomSizedCrop(size=img_dim, consistent=True, p=1.0),
            RandomHorizontalFlip(consistent=True),
            RandomGray(consistent=False, p=0.5),
            ColorJitter(0.5, 0.5, 0.5, 0.25, consistent=False, p=1.0),
            Normalize(),
        ])
    raise ValueError(f"no pretrain recipe for {dataset!r}")


def finetune_transform(img_dim: int, mode: str = "train",
                       five_crop: bool = False) -> Compose:
    if five_crop and mode == "test":
        # the reference's dormant 5-crop test path
        # (eval/dataset_3d_lc.py:98-107, eval/test.py:117-121): corners +
        # centre at 224, each scaled to img_dim; crops ride the window
        # axis and the softmax average covers them
        return Compose([
            FiveCrop(224),
            PerCrop(Scale(size=(img_dim, img_dim))),
            Normalize(),
        ])
    if mode == "train":
        return Compose([
            RandomSizedCrop(size=224, consistent=True),
            Scale(size=(img_dim, img_dim)),
            RandomHorizontalFlip(consistent=True),
            ColorJitter(0.5, 0.5, 0.5, 0.25, consistent=True, p=0.3),
            Normalize(),
        ])
    if mode == "val":
        return Compose([
            RandomSizedCrop(size=224, consistent=True, p=0.3),
            Scale(size=(img_dim, img_dim)),
            RandomHorizontalFlip(consistent=True),
            ColorJitter(0.2, 0.2, 0.2, 0.1, consistent=True, p=0.3),
            Normalize(),
        ])
    # test: deterministic center path (eval/test.py:121-126)
    return Compose([
        RandomSizedCrop(size=224, consistent=True, p=0.0),
        Scale(size=(img_dim, img_dim)),
        Normalize(),
    ])
