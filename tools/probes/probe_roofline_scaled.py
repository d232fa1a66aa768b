"""Roofline accounting for the scaled headline configs (VERDICT r4 #3).

R18-128 got a full FLOPS/MFU account in rounds 2-3 (docs/RESULTS.md
"Roofline context" + "Round-3: roofline study"); the two scaled headline
rows — R34-224 batch 16 (the reference's best-published-accuracy recipe,
/root/reference/README.md:17) and R34-128 num_seq 10 pred 5 batch 32 —
only ever had throughput numbers.  This probe closes that gap with the
compiler's own numbers instead of hand-counted conv FLOPs:

  - builds the exact train step of the recorded throughput rows
    (docs/RESULTS.md throughput table: bf16 compute, no remat, local
    negatives, donate; R34-224 feeds bf16, the others f32),
  - pulls `flops` and `bytes accessed` from the compiled executable's
    cost_analysis (verified on this backend: a 512x512x512 bf16 matmul
    reports 268.7 MFLOP vs 268.4 analytic),
  - times steady-state steps best-of-5-windows with a scalar fetch
    (the tunnel-safe protocol, see bench_breakdown.scalarize), and
  - derives sustained TFLOPS, MFU vs the v5e bf16 peak (197 TFLOPS),
    the step's arithmetic intensity, and the bandwidth-roofline bound
    min(peak, intensity * 819 GB/s) that tells us whether the config is
    compute- or bandwidth-limited and how close to its own ceiling it
    runs.

Usage (quiet host, real chip):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_roofline_scaled.py
"""
import json
import time

import jax
import jax.numpy as jnp

from dpc_tpu.core.config import DPCConfig, TrainConfig
from dpc_tpu.models import dpc
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import optim, pretrain_step

PEAK_FLOPS = 197e12   # v5e bf16 peak (per chip)
PEAK_BW = 819e9       # v5e HBM bandwidth, bytes/s
WINDOWS, ITERS = 5, 20

CONFIGS = [
    ("R18-128 8x5 pred3 b64", dict(), 64, jnp.float32),
    ("R34-224 8x5 pred3 b16",
     dict(network="resnet34", img_dim=224), 16, jnp.bfloat16),
    ("R34-128 10x5 pred5 b32",
     dict(network="resnet34", num_seq=10, pred_step=5), 32, jnp.float32),
]


def run(name, cfg_kw, batch, feed_dtype):
    cfg = DPCConfig(compute_dtype="bfloat16", **cfg_kw)
    tcfg = TrainConfig(batch_size=batch, lr=1e-3, wd=1e-5,
                       negatives="local", donate=True)
    mesh = meshlib.make_mesh(1)
    params = dpc.init_dpc(jax.random.PRNGKey(0), cfg)
    tx = optim.pretrain_optimizer(params, tcfg.lr, tcfg.wd)
    state = meshlib.replicate(mesh, pretrain_step.TrainState(
        params, tx.init(params), jnp.zeros((), jnp.int32)))
    step = pretrain_step.make_pretrain_step(cfg, tcfg, mesh, tx)
    x = jax.random.normal(
        jax.random.PRNGKey(1),
        (batch, cfg.num_seq, cfg.seq_len, cfg.img_dim, cfg.img_dim, 3),
        feed_dtype)
    xb = meshlib.shard_batch(mesh, x)
    key = jax.random.PRNGKey(2)

    # compile ONCE (AOT) and use the same executable for the cost account
    # and the timing loop — one remote compile per config
    compiled = step.lower(state, xb, key).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    bytes_acc = float(ca.get("bytes accessed", float("nan")))
    step = compiled

    # warmup (2 steps), then best-of-5 windows, scalar fetch per window
    state, m = step(state, xb, key); float(m["loss"])
    state, m = step(state, xb, key); float(m["loss"])
    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, m = step(state, xb, key)
        float(m["loss"])
        rates.append(ITERS / (time.perf_counter() - t0))
    sps = max(rates)                      # steps/s, quietest window
    ms_step = 1e3 / sps
    clips_s = batch * sps
    tflops = flops * sps / 1e12
    mfu = flops * sps / PEAK_FLOPS
    intensity = flops / bytes_acc        # FLOP per HLO byte accessed
    bw_bound_flops = min(PEAK_FLOPS, intensity * PEAK_BW)
    frac_of_own_roofline = flops * sps / bw_bound_flops
    out = {
        "config": name, "batch": batch,
        "feed": str(jnp.dtype(feed_dtype)),
        "ms_per_step": round(ms_step, 1),
        "clips_per_s": round(clips_s, 1),
        "step_gflops": round(flops / 1e9, 1),
        "gflops_per_clip": round(flops / 1e9 / batch, 1),
        "step_gbytes": round(bytes_acc / 1e9, 2),
        "sustained_tflops": round(tflops, 1),
        "mfu_pct": round(100 * mfu, 1),
        "arith_intensity_flop_per_byte": round(intensity, 1),
        "ridge_flop_per_byte": round(PEAK_FLOPS / PEAK_BW, 1),
        "bound": "compute" if intensity >= PEAK_FLOPS / PEAK_BW
                 else "bandwidth",
        "pct_of_own_roofline": round(100 * frac_of_own_roofline, 1),
        "window_spread_pct": round(
            100 * (max(rates) - min(rates)) / max(rates), 1),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    for spec in CONFIGS:
        try:
            run(*spec)
        except Exception as e:  # keep later configs alive
            print(json.dumps({"config": spec[0], "error":
                              f"{type(e).__name__}: {str(e)[:200]}"}),
                  flush=True)
