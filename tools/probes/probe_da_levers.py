"""A/B the candidate levers for the residual --device_augment cost
(VERDICT r4 #4, follow-on to probe_da_breakdown.py).

probe_da_breakdown decomposed the crop_resize chain's 22 ms:
resize 8.3 (vs a 1.1 ms traffic floor), gray +5.7, jitter +5.9 —
i.e. the cost is gathers (jax.image.resize NEAREST, gray's
take_along_axis) and unfused elementwise passes, not HBM bytes.
This probe measures each replacement in isolation, self-contained
(legacy implementations inlined so it stays runnable after
device_augment.py is rewritten):

  resize 224→128 NEAREST, per-batch [B, F=40, 224, 224, 3] uint8:
    r_jaximage : jax.image.resize (the legacy op)
    r_gather   : two static-index gathers (cv2 INTER_NEAREST indices)
    r_einsum   : separable 0/1 selection-matrix contraction (MXU;
                 exact — one nonzero per output row)
  gray (post-resize f32 [B,40,128,128,3]):
    g_gather   : take_along_axis channel pick (legacy)
    g_onehot   : one-hot multiply-reduce (fusable elementwise)
  jitter (same geometry):
    j_seq      : brightness→contrast→saturation→hue sequential (legacy)
    j_affine   : the composed per-frame 3x3 affine (one pass + one
                 frame-mean pass; identical distribution, fp-reassociated)

  PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_da_levers.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dpc_tpu.train.bench_breakdown import scalarize

B, ITERS = 64, 20
SRC, IMG, F = 224, 128, 40
LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def timeit(fn, *args) -> float:
    s = fn(*args); float(s)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s = fn(*args)
        float(s)
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    return best


def cv2_nearest_idx(out: int, src: int) -> np.ndarray:
    return np.minimum(np.floor(np.arange(out) * (src / out)),
                      src - 1).astype(np.int32)


# ---- resize variants (vmapped over batch like augment_batch) ----

def r_jaximage(x):              # [B,F,224,224,3] uint8 -> f32/255
    def one(clip):
        r = jax.image.resize(clip, (F, IMG, IMG, 3), "nearest")
        return r.astype(jnp.float32) / 255.0
    return jax.vmap(one)(x)


IY = jnp.asarray(cv2_nearest_idx(IMG, SRC))
IX = jnp.asarray(cv2_nearest_idx(IMG, SRC))


def r_gather(x):
    def one(clip):
        return clip[:, IY][:, :, IX].astype(jnp.float32) / 255.0
    return jax.vmap(one)(x)


WY = jnp.asarray((np.arange(SRC)[None, :] ==
                  cv2_nearest_idx(IMG, SRC)[:, None]).astype(np.float32))


def r_einsum(x):
    def one(clip):
        # one nonzero per row -> exact selection even at bf16 precision
        return jnp.einsum("oh,fhwc,pw->fopc", WY,
                          clip.astype(jnp.float32), WY) / 255.0
    return jax.vmap(one)(x)


# ---- gray variants ----

def _gray_in(key, x):
    t = x.shape[0]
    k1, k2 = jax.random.split(key)
    apply = jax.random.bernoulli(k1, 0.5, (t,))
    chan = jax.random.randint(k2, (t,), 0, 3)
    return apply, chan


def g_gather(key, x):
    def one(key, clip):
        apply, chan = _gray_in(key, clip)
        picked = jnp.take_along_axis(
            clip, chan.reshape((-1, 1, 1, 1)), axis=-1)
        gray = jnp.broadcast_to(picked, clip.shape)
        return jnp.where(apply.reshape((-1, 1, 1, 1)), gray, clip)
    return jax.vmap(one)(jax.random.split(key, x.shape[0]), x)


def g_onehot(key, x):
    def one(key, clip):
        apply, chan = _gray_in(key, clip)
        w = jax.nn.one_hot(chan, 3, dtype=clip.dtype).reshape((-1, 1, 1, 3))
        gray = jnp.sum(clip * w, axis=-1, keepdims=True)
        return jnp.where(apply.reshape((-1, 1, 1, 1)),
                         jnp.broadcast_to(gray, clip.shape), clip)
    return jax.vmap(one)(jax.random.split(key, x.shape[0]), x)


# ---- jitter variants ----

def _factors(key, t):
    kb, kc, ks, kh = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (t, 1, 1, 1), minval=0.5, maxval=1.5)
    fc = jax.random.uniform(kc, (t, 1, 1, 1), minval=0.5, maxval=1.5)
    fs = jax.random.uniform(ks, (t, 1, 1, 1), minval=0.5, maxval=1.5)
    fh = jax.random.uniform(kh, (t, 1, 1, 1), minval=-0.25, maxval=0.25)
    return fb, fc, fs, fh


def j_seq(key, x):
    def one(key, clip):
        fb, fc, fs, fh = _factors(key, clip.shape[0])
        x = clip * fb
        lum = (x[..., :1] * 0.299 + x[..., 1:2] * 0.587
               + x[..., 2:3] * 0.114)
        mean = jnp.mean(lum, axis=(-3, -2, -1), keepdims=True)
        x = x * fc + mean * (1 - fc)
        x = x * fs + lum * (1 - fs)
        theta = 2.0 * jnp.pi * fh
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        one3, sq3 = 1.0 / 3.0, 1.0 / np.sqrt(3.0)
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
        return jnp.clip(jnp.concatenate([rr, gg, bb], -1), 0.0, 1.0)
    return jax.vmap(one)(jax.random.split(key, x.shape[0]), x)


def j_affine(key, x):
    def one(key, clip):
        t = clip.shape[0]
        fb, fc, fs, fh = (f.reshape(t) for f in _factors(key, t))
        L = jnp.asarray(LUMA)
        mu = jnp.mean(clip, axis=(-3, -2))                 # [T,3]
        m = fb * jnp.sum(mu * L, -1)                       # frame luma mean
        theta = 2.0 * jnp.pi * fh
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        one3, sq3 = 1.0 / 3.0, 1.0 / np.sqrt(3.0)
        a = cos + (1 - cos) * one3
        bq = one3 * (1 - cos) - sq3 * sin
        cq = one3 * (1 - cos) + sq3 * sin
        R = jnp.stack([jnp.stack([a, bq, cq], -1),
                       jnp.stack([cq, a, bq], -1),
                       jnp.stack([bq, cq, a], -1)], -2)    # [T,3,3]
        I3 = jnp.eye(3)
        J = jnp.ones((3, 1)) * L[None, :]
        A = (fs * fc * fb)[:, None, None] * I3 \
            + ((1 - fs) * fb)[:, None, None] * J
        # HIGHEST: default TPU matmul precision would round the composed
        # coefficients to bf16 (~4e-3 pixel error vs sequential)
        M = jnp.matmul(R, A, precision=jax.lax.Precision.HIGHEST)
        beta = (fs * (1 - fc) * m)[:, None, None, None]
        out = jnp.sum(clip[..., None, :] * M[:, None, None, :, :], -1)
        return jnp.clip(out + beta, 0.0, 1.0)
    return jax.vmap(one)(jax.random.split(key, x.shape[0]), x)


def main() -> None:
    rng = np.random.default_rng(1)
    u8 = jnp.asarray(rng.integers(0, 255, (B, F, SRC, SRC, 3), np.uint8))
    f32 = jnp.asarray(rng.random((B, F, IMG, IMG, 3), np.float32))
    key = jax.random.PRNGKey(0)

    # numeric sanity before timing.  SCALAR fetches only: pulling a
    # full [2,40,128,128,3] result through the tunnel hangs (the same
    # reason the timing protocol reduces in-jit, SKILL.md)
    def maxdiff(f1, f2, *args):
        return float(jax.jit(lambda *a: jnp.max(jnp.abs(
            f1(*a).astype(jnp.float32) - f2(*a).astype(jnp.float32))))(
                *args))

    d = maxdiff(r_gather, r_einsum, u8[:2])
    assert d == 0.0, f"einsum selection != gather selection: {d}"
    d = maxdiff(lambda x: g_gather(key, x), lambda x: g_onehot(key, x),
                f32[:2])
    assert d == 0.0, f"one-hot gray != gather gray: {d}"
    err = maxdiff(lambda x: j_seq(key, x), lambda x: j_affine(key, x),
                  f32[:2])
    assert err < 1e-5, f"affine jitter deviates: {err}"
    print(f"sanity OK (affine-vs-seq max |err| {err:.2e})", flush=True)

    for name, fn, args in [
            ("r_jaximage", r_jaximage, (u8,)),
            ("r_gather", r_gather, (u8,)),
            ("r_einsum", r_einsum, (u8,)),
            ("g_gather", g_gather, (key, f32)),
            ("g_onehot", g_onehot, (key, f32)),
            ("j_seq", j_seq, (key, f32)),
            ("j_affine", j_affine, (key, f32))]:
        print(f"{name:>12}: {timeit(scalarize(fn), *args):7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
