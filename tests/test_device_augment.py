"""On-device augmentation: shapes, ranges, determinism, op semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from dpc_tpu.data import device_augment as da


def _clips(b=2, n=2, sl=3, h=40, w=48):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(0, 255, (b, n, sl, h, w, 3),
                                    dtype=np.uint8))


def test_pretrain_augment_shapes_and_determinism():
    clips = _clips()
    out = da.pretrain_augment(jax.random.PRNGKey(0), clips, 32)
    assert out.shape == (2, 2, 3, 32, 32, 3)
    assert out.dtype == jnp.float32
    out2 = da.pretrain_augment(jax.random.PRNGKey(0), clips, 32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = da.pretrain_augment(jax.random.PRNGKey(1), clips, 32)
    assert not np.allclose(np.asarray(out), np.asarray(out3))


def test_normalized_range():
    out = da.pretrain_augment(jax.random.PRNGKey(0), _clips(), 32)
    a = np.asarray(out)
    assert a.min() > -3.0 and a.max() < 3.0


def test_color_jitter_matches_sequential_reference():
    """The production ``color_jitter`` composes brightness/contrast/
    saturation/hue into one per-frame 3x3 affine; pin it against the
    literal sequential op order (the reference semantics,
    utils/augmentation.py ColorJitter) on the same draws."""
    def sequential(key, clip, b, c, s, h, per_frame):
        t = clip.shape[0]
        shape = (t, 1, 1, 1) if per_frame else (1, 1, 1, 1)
        kb, kc, ks, kh = jax.random.split(key, 4)
        fb = jax.random.uniform(kb, shape, minval=max(0, 1 - b),
                                maxval=1 + b)
        fc = jax.random.uniform(kc, shape, minval=max(0, 1 - c),
                                maxval=1 + c)
        fs = jax.random.uniform(ks, shape, minval=max(0, 1 - s),
                                maxval=1 + s)
        fh = jax.random.uniform(kh, shape, minval=-h, maxval=h)
        x = clip * fb
        lum = (x[..., :1] * 0.299 + x[..., 1:2] * 0.587
               + x[..., 2:3] * 0.114)
        mean = jnp.mean(lum, axis=(-3, -2, -1), keepdims=True)
        x = x * fc + mean * (1 - fc)
        x = x * fs + lum * (1 - fs)
        theta = 2.0 * jnp.pi * fh
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        one3, sq3 = 1.0 / 3.0, 1.0 / np.sqrt(3.0)
        r, g, bl = x[..., 0:1], x[..., 1:2], x[..., 2:3]
        rr = (cos + (1 - cos) * one3) * r \
            + (one3 * (1 - cos) - sq3 * sin) * g \
            + (one3 * (1 - cos) + sq3 * sin) * bl
        gg = (one3 * (1 - cos) + sq3 * sin) * r \
            + (cos + one3 * (1 - cos)) * g \
            + (one3 * (1 - cos) - sq3 * sin) * bl
        bb = (one3 * (1 - cos) - sq3 * sin) * r \
            + (one3 * (1 - cos) + sq3 * sin) * g \
            + (cos + one3 * (1 - cos)) * bl
        return jnp.clip(jnp.concatenate([rr, gg, bb], -1), 0.0, 1.0)

    rng = np.random.default_rng(11)
    clip = jnp.asarray(rng.random((4, 8, 8, 3), np.float32))
    for per_frame in (True, False):
        for key in (jax.random.PRNGKey(0), jax.random.PRNGKey(5)):
            want = sequential(key, clip, 0.5, 0.5, 0.5, 0.25, per_frame)
            got = da.color_jitter(key, clip, per_frame=per_frame)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-6)


def test_random_gray_is_channel_split():
    clip = jnp.asarray(np.random.default_rng(1).random((4, 8, 8, 3)),
                       jnp.float32)
    out = da.random_gray(jax.random.PRNGKey(0), clip, p=1.0)
    a = np.asarray(out)
    np.testing.assert_allclose(a[..., 0], a[..., 1])
    np.testing.assert_allclose(a[..., 1], a[..., 2])


def test_hflip_is_exact_mirror():
    clip = jnp.asarray(np.random.default_rng(2).random((2, 4, 6, 3)),
                       jnp.float32)
    # find a key that flips
    for s in range(10):
        out = np.asarray(da.random_hflip(jax.random.PRNGKey(s), clip))
        if not np.allclose(out, np.asarray(clip)):
            np.testing.assert_allclose(out, np.asarray(clip)[:, :, ::-1])
            return
    raise AssertionError("no flip in 10 keys")


def test_crop_identity_when_area_full():
    clip = jnp.asarray(np.random.default_rng(3).random((2, 16, 16, 3)),
                       jnp.float32)
    out = da.random_resized_crop(jax.random.PRNGKey(0), clip, 16,
                                 area_range=(1.0, 1.0),
                                 aspect_range=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(clip),
                               rtol=1e-5, atol=1e-5)


def test_color_jitter_identity_at_zero():
    clip = jnp.asarray(np.random.default_rng(4).random((2, 4, 4, 3)),
                       jnp.float32)
    out = da.color_jitter(jax.random.PRNGKey(0), clip, brightness=0.0,
                          contrast=0.0, saturation=0.0, hue=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(clip),
                               rtol=1e-5, atol=1e-6)


def _video_frames(t, h, w, seed):
    """Video-like frames with spatially STATIONARY statistics (smooth
    blotch texture + motion): channel means must not depend on crop
    position, or crop-location sampling noise would swamp the
    distribution comparison below."""
    rng = np.random.default_rng(seed)
    lo = rng.uniform(40, 215, (h // 8 + 2, w // 8 + 2, 3))
    base = np.stack([np.kron(lo[..., c], np.ones((8, 8)))[:h, :w]
                     for c in range(3)], -1)
    frames = np.empty((t, h, w, 3), np.uint8)
    for i in range(t):
        f = base + rng.normal(0, 15, (h, w, 3))
        frames[i] = np.clip(np.roll(f, i * 3, axis=1), 0, 255)
    return frames


def _distribution_check(host_tf, precrop, recipe, src_hw, img=64, n=32):
    """Host full-chain vs host-precrop + device chain: the output
    distributions must agree (VERDICT r1 missing #4 — the device recipe
    must implement the same geometry as the host recipe).

    The tolerance is self-calibrating: the host chain is run with two
    independent seed sets, and the device chain must sit within a few
    multiples of that host-vs-host sampling spread (the random hue/crop
    draws move per-run channel means materially even for one pipeline).
    """
    host_a, host_b, dev_in = [], [], []
    for s in range(n):
        frames = _video_frames(4, *src_hw, seed=s)
        host_a.append(host_tf(frames, np.random.default_rng(s)))
        host_b.append(host_tf(frames, np.random.default_rng(5000 + s)))
        dev_in.append(precrop(frames, np.random.default_rng(100 + s)))
    dev = np.stack(dev_in)[:, None]  # [B, N=1, SL, H, W, C]
    if recipe.startswith("finetune_"):
        out = np.asarray(da.finetune_augment_batch(
            jax.random.PRNGKey(0), jnp.asarray(dev), img,
            mode=recipe.split("_", 1)[1]))
    else:
        out = np.asarray(da.augment_batch(jax.random.PRNGKey(0),
                                          jnp.asarray(dev), img,
                                          recipe=recipe))
    a, b, d = np.stack(host_a), np.stack(host_b), out
    assert d.shape[-3:-1] == (img, img)
    for c in range(3):
        noise_mean = abs(a[..., c].mean() - b[..., c].mean())
        noise_std = abs(a[..., c].std() - b[..., c].std())
        assert abs(a[..., c].mean() - d[..., c].mean()) < \
            3 * noise_mean + 0.06, (c, a[..., c].mean(), b[..., c].mean(),
                                    d[..., c].mean())
        assert abs(a[..., c].std() - d[..., c].std()) < \
            3 * noise_std + 0.08, (c, a[..., c].std(), b[..., c].std(),
                                   d[..., c].std())


def test_device_matches_host_distribution_ucf_recipe():
    from dpc_tpu.data import augment as A

    host_tf = A.pretrain_transform("ucf101", 64)
    precrop = A.Compose([A.Scale(240), A.PadTo(224, 224),
                         A.RandomCrop((224, 224), consistent=True)])
    _distribution_check(host_tf, precrop, "crop_resize", (240, 320))


def test_device_matches_host_distribution_k400_recipe():
    from dpc_tpu.data import augment as A

    host_tf = A.pretrain_transform("k400", 64)
    precrop = A.Compose([A.Scale(150), A.PadTo(150, 200),
                         A.RandomCrop((150, 200), consistent=True)])
    _distribution_check(host_tf, precrop, "sized_crop", (150, 200))


def test_finetune_augment_shapes_and_determinism():
    clips = _clips(h=60, w=80)
    for mode in ("train", "val"):
        out = da.finetune_augment_batch(jax.random.PRNGKey(0), clips, 32,
                                        mode=mode)
        assert out.shape == (2, 2, 3, 32, 32, 3)
        assert out.dtype == jnp.float32
        out2 = da.finetune_augment_batch(jax.random.PRNGKey(0), clips, 32,
                                         mode=mode)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_center_crop_resize_matches_host_exactly():
    # the val recipe's crop p-miss path must be bit-identical to the
    # host ops AS THE RECIPE USES THEM: CenterCrop(224) -> Scale(128)
    # with Scale's DEFAULT interpolation (nearest, like the reference's
    # utils/augmentation.py:20) — crop + NEAREST are gathers, so uint8
    # in, exact equality out.  Includes an odd-margin geometry (231) to
    # pin CenterCrop's round-half origin.
    from dpc_tpu.data import augment as A

    for hw in [(240, 320), (231, 309)]:
        clip = np.random.default_rng(1).integers(
            0, 255, (3, *hw, 3), np.uint8)
        host = A.Compose([
            A.CenterCrop(224), A.Scale(size=(128, 128))])(
                clip, np.random.default_rng(0))
        dev = np.asarray(da.center_crop_resize(jnp.asarray(clip),
                                               224, 128))
        np.testing.assert_array_equal(host.astype(np.float32), dev)


def test_device_matches_host_distribution_finetune_recipe():
    # finetune train: RandomSizedCrop over the FULL frame; host window =
    # the whole 240x320 frame (identity precrop)
    from dpc_tpu.data import augment as A

    host_tf = A.finetune_transform(64, "train")
    precrop = A.Compose([A.Scale(240), A.PadTo(240, 320),
                         A.RandomCrop((240, 320), consistent=True)])
    _distribution_check(host_tf, precrop, "finetune_train", (240, 320))


def test_device_matches_host_distribution_finetune_val_recipe():
    from dpc_tpu.data import augment as A

    host_tf = A.finetune_transform(64, "val")
    precrop = A.Compose([A.Scale(240), A.PadTo(240, 320),
                         A.RandomCrop((240, 320), consistent=True)])
    _distribution_check(host_tf, precrop, "finetune_val", (240, 320))


def test_random_gray_clip_consistent_mode():
    # per_frame=False: ONE coin flip / channel pick for the whole clip
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dpc_tpu.data import device_augment as da

    clip = jnp.asarray(np.random.default_rng(0).random((4, 8, 8, 3),),
                       jnp.float32)
    out = np.asarray(da.random_gray(jax.random.PRNGKey(3), clip, p=1.0,
                                    per_frame=False))
    # every frame collapsed to the SAME channel
    assert np.allclose(out[..., 0], out[..., 1])
    assert np.allclose(out[..., 0], out[..., 2])
    src = np.asarray(clip)
    match = [np.allclose(out[..., 0], src[..., c]) for c in range(3)]
    assert sum(match) == 1


def test_test_preprocess_bitexact_center():
    # dense-test device half vs the host test chain (CenterCrop(224) ->
    # Scale(img) NEAREST -> Normalize): crop+nearest are pure gathers,
    # so host and device agree to Normalize's fused-op tolerance
    from dpc_tpu.data import augment as A

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (2, 3, 240, 320, 3), np.uint8)
    host_tf = A.finetune_transform(32, "test")
    host = np.stack([host_tf(f, np.random.default_rng(0))
                     for f in frames])                     # [2, 3, 32, 32, 3]
    dev = da.test_preprocess_batch(jnp.asarray(frames[:, None]), 32, 224)
    np.testing.assert_allclose(host, np.asarray(dev)[:, 0], atol=2e-6)


def test_test_preprocess_bitexact_five_crop():
    from dpc_tpu.data import augment as A

    rng = np.random.default_rng(8)
    frames = rng.integers(0, 255, (3, 240, 320, 3), np.uint8)
    host_tf = A.finetune_transform(32, "test", five_crop=True)
    host = host_tf(frames, np.random.default_rng(0))       # [5, 3, 32, 32, 3]
    dev = da.test_preprocess_batch(jnp.asarray(frames[None, None]), 32,
                                   224, five_crop=True)    # [5, 1, 3, ...]
    np.testing.assert_allclose(host, np.asarray(dev)[:, 0], atol=2e-6)


def test_resize_fixed_float_input_matches_gather_exactly():
    # the selection-matrix einsum's exactness contract covers FLOAT
    # inputs too (the matmul takes HIGHEST precision there — default TPU
    # precision would round general f32 values to bf16; uint8 callers
    # keep the default, their 0..255 values are bf16-exact either way)
    rng = np.random.default_rng(9)
    clip = rng.random((2, 37, 53, 3), np.float32)
    for src_clip in (clip, (clip * 255).astype(np.uint8)):
        out = da.resize_fixed(jnp.asarray(src_clip), 16)
        idx_y = da._cv2_nearest_idx(16, 37)
        idx_x = da._cv2_nearest_idx(16, 53)
        ref = src_clip.astype(np.float32)[:, idx_y][:, :, idx_x]
        np.testing.assert_array_equal(np.asarray(out), ref)


def test_cv2_nearest_idx_matches_cv2():
    # the device NEAREST resample must replicate cv2.INTER_NEAREST's
    # index math exactly for every (src, out) the recipes hit
    import cv2

    for src, out in [(224, 128), (224, 32), (130, 32), (150, 128),
                     (224, 224), (100, 64)]:
        img = np.arange(src, dtype=np.uint8)[None, :, None]
        ref = cv2.resize(img, (out, 1), interpolation=cv2.INTER_NEAREST)
        idx = da._cv2_nearest_idx(out, src)
        np.testing.assert_array_equal(ref.reshape(-1), idx.astype(np.uint8))


class TestFoldNormalize:
    """The stem-conv normalize fold (layers.conv3d_input_norm) must match
    normalize-then-conv to rounding — including the zero-padded borders,
    where a constant bias would be wrong (VERDICT r3 #6, PARITY.md #14)."""

    def _conv_params(self, seed=0):
        from dpc_tpu.models import layers as L

        return L.init_conv3d(jax.random.PRNGKey(seed), 3, 16, (1, 7, 7))

    def test_conv_fold_matches_normalize_then_conv_f32(self):
        from dpc_tpu.models import layers as L

        p = self._conv_params()
        rng = np.random.default_rng(0)
        x01 = jnp.asarray(rng.random((2, 5, 40, 48, 3), np.float32))
        want = L.conv3d(p, (x01 - da.IMAGENET_MEAN) / da.IMAGENET_STD,
                        (1, 2, 2), (0, 3, 3), jnp.float32)
        got = L.conv3d_input_norm(p, x01, (1, 2, 2), (0, 3, 3),
                                  jnp.float32, da.INPUT_NORM_01)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6, rtol=2e-6)

    def test_conv_fold_uint8_scale255(self):
        from dpc_tpu.models import layers as L

        p = self._conv_params(1)
        rng = np.random.default_rng(1)
        xu8 = jnp.asarray(rng.integers(0, 255, (1, 5, 33, 47, 3), np.uint8))
        want = L.conv3d(
            p, (xu8.astype(jnp.float32) / 255.0 - da.IMAGENET_MEAN)
            / da.IMAGENET_STD, (1, 2, 2), (0, 3, 3), jnp.float32)
        got = L.conv3d_input_norm(p, xu8, (1, 2, 2), (0, 3, 3),
                                  jnp.float32, da.INPUT_NORM_U8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6, rtol=2e-6)

    def test_fused_stem_fold_matches_unfolded(self):
        # through the production stem (fused_stem with the sign trick and
        # batch-stat BN), borders included
        from dpc_tpu.models import layers as L

        kc, kb = jax.random.split(jax.random.PRNGKey(2))
        conv_p = L.init_conv3d(kc, 3, 16, (1, 7, 7))
        bn_p, _ = L.init_batchnorm(16, False)
        bn_p = dict(bn_p)
        bn_p["scale"] = jax.random.normal(kb, (16,))  # exercise sgn fold
        rng = np.random.default_rng(2)
        x01 = jnp.asarray(rng.random((2, 5, 64, 64, 3), np.float32))
        want, _ = L.fused_stem(conv_p, bn_p,
                               (x01 - da.IMAGENET_MEAN) / da.IMAGENET_STD)
        got, _ = L.fused_stem(conv_p, bn_p, x01,
                              input_norm=da.INPUT_NORM_01)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=5e-4)

    def test_lc_dense_test_fold_end_to_end(self):
        # the dense-test DA path: uint8 windows + INPUT_NORM_U8 vs the
        # literal normalize — logits must agree to f32 rounding
        from dpc_tpu.core.config import DPCConfig
        from dpc_tpu.models import lc

        cfg = DPCConfig(img_dim=32, num_seq=2, seq_len=4)
        params, state = lc.init_lc(jax.random.PRNGKey(3), cfg,
                                   num_classes=5)
        rng = np.random.default_rng(3)
        windows = jnp.asarray(rng.integers(0, 255, (2, 2, 4, 130, 130, 3),
                                           np.uint8))
        xn = da.test_preprocess_batch(windows, 32, 32)
        want, _, _ = lc.apply_lc(params, state, xn, cfg=cfg,
                                 num_classes=5, train=False)
        xu = da.test_preprocess_batch(windows, 32, 32, normalize_out=False)
        assert xu.dtype == jnp.uint8
        got, _, _ = lc.apply_lc(params, state, xu, cfg=cfg, num_classes=5,
                                train=False, input_norm=da.INPUT_NORM_U8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-3)
