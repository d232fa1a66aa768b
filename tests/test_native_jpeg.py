"""Native libjpeg decoder: parity with cv2, fused resize, batch + corrupt
handling, dataset integration."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dpc_tpu import native  # noqa: E402

if not native.available():  # pragma: no cover
    pytest.skip("native decoder unavailable", allow_module_level=True)


def _jpeg(h=240, w=320, seed=0, quality=80):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.uint8)
    for _ in range(6):
        cv2.circle(img, (int(rng.integers(0, w)), int(rng.integers(0, h))),
                   int(rng.integers(20, 60)),
                   tuple(int(c) for c in rng.integers(0, 255, 3)), -1)
    ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, quality])
    assert ok
    return buf.tobytes()


def test_decode_matches_cv2_exactly():
    data = _jpeg()
    ours = native.decode_jpeg(data)
    ref = cv2.cvtColor(cv2.imdecode(np.frombuffer(data, np.uint8),
                                    cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(ours, ref)


def test_fused_resize_close_to_cv2():
    data = _jpeg()
    ours = native.decode_jpeg(data, (120, 160))
    ref = cv2.resize(
        cv2.cvtColor(cv2.imdecode(np.frombuffer(data, np.uint8),
                                  cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB),
        (160, 120), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # DCT-domain prescale + fixed-point bilinear vs full decode + cv2
    # bilinear: tiny mean difference, bounded worst case at edges
    assert diff.mean() < 2.0
    assert (diff > 8).mean() < 0.01


def test_batch_decode_and_corrupt_frames():
    data = _jpeg()
    out, failures = native.decode_jpeg_batch([data] * 7 + [b"garbage"],
                                             64, 64, threads=3)
    assert out.shape == (8, 64, 64, 3)
    assert failures == 1
    assert out[7].max() == 0          # corrupt frame zeroed
    assert out[0].max() > 0


def test_grayscale_jpeg_expands_to_rgb():
    gray = np.random.default_rng(0).integers(0, 255, (60, 80),
                                             dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", gray)
    out = native.decode_jpeg(buf.tobytes())
    assert out.shape == (60, 80, 3)
    np.testing.assert_array_equal(out[..., 0], out[..., 1])


def test_load_frame_uses_native(tmp_path):
    from dpc_tpu.data.video_dataset import load_frame

    data = _jpeg()
    p = tmp_path / "image_00001.jpg"
    p.write_bytes(data)
    full = load_frame(str(p))
    assert full.shape == (240, 320, 3)
    sized = load_frame(str(p), (96, 96))
    assert sized.shape == (96, 96, 3)
