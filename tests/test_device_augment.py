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
