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


# ---------------------------------------------------------------------------
# ROI (scale+crop) decode — round-3 VERDICT #4
# ---------------------------------------------------------------------------

def test_scale_crop_identity_short_side_is_exact():
    """240-short tree (the extraction contract): the ROI decode must be
    bit-identical to full-decode-then-slice, including at crop
    boundaries (chroma-upsampling context margin)."""
    data = _jpeg(240, 320, seed=3)
    full = native.decode_jpeg(data)
    for cy, cx in [(0, 0), (8, 60), (16, 96), (0, 96), (16, 0)]:
        got = native.decode_jpeg_scale_crop(data, 240, (cy, cx, 224, 224))
        np.testing.assert_array_equal(got, full[cy:cy+224, cx:cx+224],
                                      err_msg=f"crop {(cy, cx)}")


def test_scale_crop_downscale_matches_fused_resize_slice():
    """Larger source: short-side scale + crop == fused scale then slice
    (same fixed-point bilinear grid)."""
    data = _jpeg(480, 640, seed=4)
    scaled = native.decode_jpeg(data, (240, 320))  # short side 240
    for cy, cx in [(0, 0), (10, 40), (16, 96)]:
        got = native.decode_jpeg_scale_crop(data, 240, (cy, cx, 224, 224))
        np.testing.assert_array_equal(got, scaled[cy:cy+224, cx:cx+224])


def test_scale_crop_out_of_bounds_raises():
    data = _jpeg(240, 320, seed=5)
    with pytest.raises(ValueError):
        native.decode_jpeg_scale_crop(data, 240, (20, 200, 224, 224))


def test_batch_scale_crop_matches_single():
    data = [_jpeg(240, 320, seed=s) for s in range(6)]
    out, fails = native.decode_jpeg_batch_scale_crop(
        data, 240, (8, 60, 224, 224), threads=3)
    assert fails == 0
    for i, d in enumerate(data):
        np.testing.assert_array_equal(
            out[i], native.decode_jpeg_scale_crop(d, 240, (8, 60, 224, 224)))


def test_host_scale_crop_plan_matches_native():
    """augment.HostScaleCrop: the planned native decode must produce the
    same window the numpy fallback slices (identity-scale tree => both
    paths are exact)."""
    from dpc_tpu.data import augment as A

    data = _jpeg(240, 320, seed=6)
    full = native.decode_jpeg(data)
    op = A.HostScaleCrop(240, (224, 224))
    rng_plan = np.random.default_rng(7)
    short, crop = op.plan((240, 320), rng_plan)
    got = native.decode_jpeg_scale_crop(data, short, crop)
    # fallback consumes the same rng draws in the same order
    want = op(full[None], np.random.default_rng(7))[0]
    np.testing.assert_array_equal(got, want)


def test_host_scale_crop_plan_none_for_portrait():
    """K400 geometry (window wider than the short side): a portrait
    source scales to 150 wide < the 200 window, needs reflect-pad —
    plan() bows out and the numpy fallback handles it."""
    from dpc_tpu.data import augment as A

    op = A.HostScaleCrop(150, (150, 200))
    assert op.plan((400, 180), np.random.default_rng(0)) is None
    # the numpy fallback reflect-pads instead
    clip = np.zeros((2, 400, 180, 3), np.uint8)
    out = op(clip, np.random.default_rng(0))
    assert out.shape == (2, 150, 200, 3)
    # landscape K400 source: plan succeeds
    assert op.plan((240, 320), np.random.default_rng(0)) is not None
