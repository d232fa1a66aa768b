"""ctypes bindings for the native (C++) data-path components.

Builds ``libdpcjpeg.so`` from ``jpeg_decoder.cpp`` on first use (g++ +
libjpeg, both baked into the image) and exposes:

  * :func:`decode_jpeg` — one file/buffer → RGB uint8 array, optionally
    fused with a resize (DCT-domain scaling + fixed-point bilinear);
  * :func:`decode_jpeg_batch` — a pthread-pool batched decode that releases
    the GIL for the whole batch.

Falls back silently when the toolchain or libjpeg is missing: callers
check :func:`available` (see ``dpc_tpu.data.video_dataset.load_frame``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "jpeg_decoder.cpp")
_SO = os.path.join(_DIR, "libdpcjpeg.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-ljpeg",
           "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover - toolchain missing
        print(f"[dpc_tpu.native] build failed ({e}); falling back to cv2")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                _failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.dpc_jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32)]
        lib.dpc_jpeg_dims.restype = ctypes.c_int
        lib.dpc_jpeg_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint8), ctypes.c_int32,
            ctypes.c_int32]
        lib.dpc_jpeg_decode_resize.restype = ctypes.c_int
        lib.dpc_jpeg_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            np.ctypeslib.ndpointer(np.int64), ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint8), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int]
        lib.dpc_jpeg_decode_batch.restype = ctypes.c_int
        lib.dpc_jpeg_decode_scale_crop.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint8), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32]
        lib.dpc_jpeg_decode_scale_crop.restype = ctypes.c_int
        lib.dpc_jpeg_decode_batch_scale_crop.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            np.ctypeslib.ndpointer(np.int64), ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint8), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int]
        lib.dpc_jpeg_decode_batch_scale_crop.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def jpeg_dims(data: bytes) -> tuple[int, int]:
    """(height, width) from the JPEG header alone — no pixel decode."""
    lib = _load()
    assert lib is not None, "native decoder unavailable"
    dims = np.zeros(2, np.int32)
    if lib.dpc_jpeg_dims(data, len(data), dims) != 0:
        raise ValueError("corrupt JPEG header")
    return int(dims[0]), int(dims[1])


def decode_jpeg(data: bytes, target_hw: Optional[tuple[int, int]] = None
                ) -> np.ndarray:
    """Decode (and optionally resize) one JPEG buffer → RGB uint8."""
    lib = _load()
    assert lib is not None, "native decoder unavailable"
    th, tw = jpeg_dims(data) if target_hw is None else target_hw
    out = np.empty((th, tw, 3), np.uint8)
    if lib.dpc_jpeg_decode_resize(
            data, len(data), out,
            -1 if target_hw is None else th,
            -1 if target_hw is None else tw) != 0:
        raise ValueError("corrupt JPEG")
    return out


def decode_jpeg_batch(buffers: Sequence[bytes], th: int, tw: int,
                      threads: int = 4) -> tuple[np.ndarray, int]:
    """Decode N JPEGs into one [N, th, tw, 3] array; returns (array,
    #failures).  Failed frames come back zeroed."""
    lib = _load()
    assert lib is not None, "native decoder unavailable"
    n = len(buffers)
    arr = (ctypes.c_char_p * n)(*buffers)
    lens = np.asarray([len(b) for b in buffers], np.int64)
    out = np.empty((n, th, tw, 3), np.uint8)
    failures = lib.dpc_jpeg_decode_batch(arr, lens, n, out, th, tw,
                                         threads)
    return out, int(failures)


def decode_file(path: str, target_hw: Optional[tuple[int, int]] = None
                ) -> np.ndarray:
    with open(path, "rb") as f:
        return decode_jpeg(f.read(), target_hw)


def decode_jpeg_scale_crop(data: bytes, short_side: int,
                           crop_yxhw: tuple[int, int, int, int]
                           ) -> np.ndarray:
    """Aspect-preserving short-side scale + ROI crop, fused into the
    decode (only the source region feeding the crop is IDCT'd).  Raises
    ValueError on corrupt input or a crop outside the scaled image —
    callers fall back to the full-decode path."""
    lib = _load()
    assert lib is not None, "native decoder unavailable"
    cy, cx, ch, cw = crop_yxhw
    out = np.empty((ch, cw, 3), np.uint8)
    rc = lib.dpc_jpeg_decode_scale_crop(data, len(data), out, short_side,
                                        cy, cx, ch, cw)
    if rc != 0:
        raise ValueError("scale_crop decode failed" if rc == 1
                         else "crop outside scaled image")
    return out


def decode_jpeg_batch_scale_crop(buffers: Sequence[bytes], short_side: int,
                                 crop_yxhw: tuple[int, int, int, int],
                                 threads: int = 4
                                 ) -> tuple[np.ndarray, int]:
    """Batched :func:`decode_jpeg_scale_crop` (one shared crop window —
    the consistent-augmentation contract); returns (array [N,ch,cw,3],
    #failures), failed frames zeroed."""
    lib = _load()
    assert lib is not None, "native decoder unavailable"
    cy, cx, ch, cw = crop_yxhw
    n = len(buffers)
    arr = (ctypes.c_char_p * n)(*buffers)
    lens = np.asarray([len(b) for b in buffers], np.int64)
    out = np.empty((n, ch, cw, 3), np.uint8)
    failures = lib.dpc_jpeg_decode_batch_scale_crop(
        arr, lens, n, out, short_side, cy, cx, ch, cw, threads)
    return out, int(failures)
