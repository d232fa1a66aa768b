"""--device_augment Normalize-fold A/B on the real chip (round-4).

Measures the three DA paths with fold_normalize on vs off:
  a) pretrain DA train step (sized_crop recipe, B64, R18-128);
  b) finetune DA train step (B32, full-geometry windows);
  c) dense-test DA forward (center, uint8 224^2 windows, WB64).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_fold.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dpc_tpu.core.config import DPCConfig, EvalConfig, TrainConfig
from dpc_tpu.models import lc
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import finetune_step, optim, pretrain_step
from dpc_tpu.train.bench_breakdown import scalarize

ITERS = 20
m = DPCConfig(img_dim=128, compute_dtype="bfloat16")
mesh = meshlib.make_mesh(0)
rng = np.random.default_rng(1)


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    # scalarize-style drain (block_until_ready alone can return early on
    # the tunnelled backend): one scalar fetch, amortised over ITERS —
    # the same additive cost lands on both A/B arms
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf)) if leaf.ndim else float(leaf)
    return (time.perf_counter() - t0) / ITERS * 1e3


def run_pretrain(fold):
    t = TrainConfig(batch_size=64, device_augment=True,
                    device_augment_recipe="sized_crop",
                    fold_normalize="on" if fold else "off", donate=False)
    tx = optim.torch_adam(t.lr, t.wd)
    step = pretrain_step.make_pretrain_step(m, t, mesh, tx)
    state = pretrain_step.init_train_state(jax.random.PRNGKey(0), m, t, tx)
    xb = jnp.asarray(rng.integers(
        0, 255, (64, m.num_seq, m.seq_len, 150, 200, 3), np.uint8))
    key = jax.random.PRNGKey(1)
    ms = timed(lambda s: step(s, xb, key)[1]["loss"], state)
    return ms, 64 / ms * 1e3


def run_finetune(fold):
    e = EvalConfig(batch_size=32, device_augment=True,
                   fold_normalize="on" if fold else "off")
    tx = optim.torch_adam(e.lr, e.wd)
    step = finetune_step.make_finetune_step(m, e, mesh, tx, donate=False)
    params, bn = lc.init_lc(jax.random.PRNGKey(0), m, e.num_classes)
    state = finetune_step.FinetuneState(
        params, bn, tx.init(params), jnp.zeros((), jnp.int32))
    xb = jnp.asarray(rng.integers(
        0, 255, (32, m.num_seq, m.seq_len, 240, 320, 3), np.uint8))
    yb = jnp.asarray(rng.integers(0, e.num_classes, (32,), np.int32))
    key = jax.random.PRNGKey(1)
    ms = timed(lambda s: step(s, xb, yb, key, jnp.float32(1.0))[1]["loss"],
               state)
    return ms, 32 / ms * 1e3


def run_dense_test(fold):
    e = EvalConfig(device_augment=True,
                   fold_normalize="on" if fold else "off")
    fwd = finetune_step.make_test_forward_sharded(m, e, mesh, test_crop=224)
    fn = scalarize(fwd)
    params, bn = lc.init_lc(jax.random.PRNGKey(0), m, e.num_classes)
    xb = jnp.asarray(rng.integers(
        0, 255, (64, m.num_seq, m.seq_len, 224, 224, 3), np.uint8))
    s = fn(params, bn, xb); float(s)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s = fn(params, bn, xb)
    float(s)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    return ms, 64 / ms * 1e3


for label, runner, unit in [
        ("pretrain DA sized_crop B64", run_pretrain, "clips/s"),
        ("finetune DA train B32", run_finetune, "clips/s"),
        ("dense-test DA center WB64", run_dense_test, "windows/s")]:
    off_ms, off_r = runner(False)
    on_ms, on_r = runner(True)
    print(f"{label}: fold off {off_ms:.1f} ms ({off_r:.1f} {unit}) -> "
          f"fold on {on_ms:.1f} ms ({on_r:.1f} {unit}) "
          f"[{(off_ms - on_ms) / off_ms * 100:+.1f}% step time]")
