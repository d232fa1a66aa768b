"""Where does the residual --device_augment on-chip cost go? (VERDICT r4 #4)

Round 3 measured the stochastic recipes' honest steady-state cost
(pretrain crop_resize −16%, sized_crop −14%, finetune −13%;
docs/RESULTS.md "the honest on-chip cost of device augmentation") but
never decomposed it.  This probe does the stem-study-style breakdown:

  1. the isolated augment chain (scalar-fetch, forward-only, own jit)
     built up piece by piece — convert+resize → +flip → +gray →
     +jitter → +normalize — so each op's marginal ms is visible;
  2. a pure-traffic floor (read the uint8 windows, reduce to a scalar)
     and the analytic bytes math at 819 GB/s, so "fundamental" has a
     number attached;
  3. one lever candidate: the same chain with the post-resize pixels in
     bf16 instead of f32 (pixels arrive as uint8 ⇒ 1/255 quantization
     already; bf16 carries ~0.004 abs error on [0,1] — same order — and
     halves the elementwise traffic);
  4. full-step anchors (no-DA vs DA) re-measured in the same session so
     the isolated numbers can be checked against the end-to-end delta.

Config: the worst recorded case — R18-128 B64 pretrain UCF
``crop_resize`` (uint8 224² windows in, −16%).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_da_breakdown.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dpc_tpu.core.config import DPCConfig, TrainConfig
from dpc_tpu.data import device_augment as da
from dpc_tpu.models import dpc as dpc_model
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import optim, pretrain_step
from dpc_tpu.train.bench_breakdown import scalarize

B, ITERS = 64, 20
IMG = 128
WIN = (B, 8, 5, 224, 224, 3)          # crop_resize host window geometry


def timeit(fn, *args) -> float:
    s = fn(*args); float(s)
    best = float("inf")
    for _ in range(3):                 # best-of-3 windows
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s = fn(*args)
        float(s)
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    return best


def chain(stages: str, dtype=jnp.float32):
    """Cumulative crop_resize chain: stages ⊆ 'rfgjn' in recipe order."""
    def per_sample(key, clip):          # clip [F,224,224,3] uint8
        kc, kf, kg, kj = jax.random.split(key, 4)
        x = da.resize_fixed(clip, IMG).astype(dtype) / dtype(255.0)
        if "f" in stages:
            x = da.random_hflip(kf, x)
        if "g" in stages:
            x = da.random_gray(kg, x, p=0.5, per_frame=True)
        if "j" in stages:
            x = da.color_jitter(kj, x, per_frame=True)
        if "n" in stages:
            x = (x - jnp.asarray(da.IMAGENET_MEAN, dtype)) / \
                jnp.asarray(da.IMAGENET_STD, dtype)
        return x

    def run(key, clips):
        b, n, sl, h, w, c = clips.shape
        flat = clips.reshape(b, n * sl, h, w, c)
        keys = jax.random.split(key, b)
        return jax.vmap(per_sample)(keys, flat)
    return run


def main() -> None:
    rng = np.random.default_rng(1)
    # generate the window ON DEVICE: a 385 MB host->device transfer
    # hangs intermittently on the tunnelled backend (SKILL.md)
    clips = jax.jit(lambda k: jax.random.randint(
        k, WIN, 0, 255, jnp.int32).astype(jnp.uint8))(jax.random.PRNGKey(9))
    jax.block_until_ready(clips)
    key = jax.random.PRNGKey(0)
    res = {}

    # pure input-traffic floor: read every uint8 byte once
    res["read_floor"] = timeit(
        scalarize(lambda x: x.astype(jnp.float32)), clips)

    for label, st in [("resize", "r"), ("+flip", "rf"), ("+gray", "rfg"),
                      ("+jitter", "rfgj"), ("+normalize(full)", "rfgjn")]:
        res[label] = timeit(scalarize(chain(st)), key, clips)

    # lever: the same full chain with bf16 elementwise traffic
    res["full_bf16"] = timeit(
        scalarize(chain("rfgjn", jnp.bfloat16)), key, clips)

    # the production entry point (sanity: should match the full chain)
    res["pretrain_augment"] = timeit(
        scalarize(lambda k, x: da.augment_batch(
            k, x, IMG, recipe="crop_resize")), key, clips)

    # analytic bytes for the f32 chain (819 GB/s → ms)
    in_b = int(np.prod(WIN))                       # uint8 window read
    act = B * 40 * IMG * IMG * 3 * 4               # one f32 activation
    print(f"bytes: window={in_b/1e9:.2f} GB, one f32 act={act/1e9:.2f} GB, "
          f"act@819GB/s={act/819e9*1e3:.2f} ms", flush=True)

    # full-step anchors (big compiles — last)
    m = DPCConfig(img_dim=IMG, compute_dtype="bfloat16")
    mesh = meshlib.make_mesh(0)
    params = dpc_model.init_dpc(jax.random.PRNGKey(0), m)
    for name, daug, shape, dt in [
            ("step_noDA", False, (B, 8, 5, IMG, IMG, 3), np.float32),
            ("step_DA", True, WIN, np.uint8)]:
        t = TrainConfig(batch_size=B, lr=1e-3, wd=1e-5, device_augment=daug,
                        device_augment_recipe="crop_resize", donate=False)
        tx = optim.pretrain_optimizer(params, t.lr, t.wd, t.train_what)
        state = meshlib.replicate(mesh, pretrain_step.TrainState(
            params, tx.init(params), jnp.zeros((), jnp.int32)))
        step = pretrain_step.make_pretrain_step(m, t, mesh, tx)
        if dt == np.uint8:
            xb = jax.jit(lambda k: jax.random.randint(
                k, shape, 0, 255, jnp.int32).astype(jnp.uint8))(
                    jax.random.PRNGKey(7))
        else:
            xb = jax.jit(lambda k: jax.random.normal(
                k, shape, jnp.float32))(jax.random.PRNGKey(7))
        jax.block_until_ready(xb)
        def run(s, x, _step=step):
            st, metrics = _step(s, x, key)   # keep state in the output
            return st.params, metrics        # else XLA DCEs bwd+Adam
        res[name] = timeit(scalarize(run), state, xb)

    for k, v in res.items():
        print(f"{k:>20}: {v:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
