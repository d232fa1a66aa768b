"""Dense-test forward with vs without --device_augment (round-3).

Measures the on-chip cost of running the deterministic test recipe
(center / 5-crop -> NEAREST scale -> normalize) inside the jitted
forward, against the host-fed f32 baseline.  Forward-only, so the
scalarized logit sum is the whole computation (nothing for XLA to DCE).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_test_da.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dpc_tpu.core.config import DPCConfig, EvalConfig
from dpc_tpu.models import lc
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import finetune_step
from dpc_tpu.train.bench_breakdown import scalarize

WB, ITERS = 64, 20
m = DPCConfig(img_dim=128, compute_dtype="bfloat16")
mesh = meshlib.make_mesh(0)
params, bn = lc.init_lc(jax.random.PRNGKey(0), m, num_classes=101)

# (label, device_augment, five_crop, input shape, dtype, windows/step)
CASES = [
    ("host-fed center (f32 128^2 in)", False, False,
     (WB, m.num_seq, m.seq_len, 128, 128, 3), np.float32, WB),
    ("device_augment center (uint8 224^2 in)", True, False,
     (WB, m.num_seq, m.seq_len, 224, 224, 3), np.uint8, WB),
    # five-crop comparison at EQUAL model work: host feeds 5x rows of
    # f32 crops; device expands WB/5 uint8 windows to WB rows on chip
    ("host-fed 5-crop (f32 128^2, WB rows incl. crops)", False, False,
     (WB, m.num_seq, m.seq_len, 128, 128, 3), np.float32, WB),
    ("device_augment 5-crop (uint8 240x320, WB/5 windows in)", True, True,
     (WB // 5, m.num_seq, m.seq_len, 240, 320, 3), np.uint8,
     (WB // 5) * 5),
]

for label, da, five, shape, dtype, rows in CASES:
    e = EvalConfig(device_augment=da, five_crop=five)
    fwd = finetune_step.make_test_forward_sharded(m, e, mesh, test_crop=224)

    fn = scalarize(fwd)
    if dtype == np.uint8:
        xb = jnp.asarray(np.random.default_rng(1).integers(
            0, 255, shape, np.uint8))
    else:
        xb = jnp.asarray(np.random.default_rng(1).normal(
            size=shape).astype(np.float32))
    s = fn(params, bn, xb); float(s)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s = fn(params, bn, xb)
    float(s)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label}: {ms:.1f} ms = {rows / ms * 1e3:.1f} model-rows/s")
