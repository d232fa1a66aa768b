"""End-to-end epoch-loop throughput: the REAL driver loop, not a device
microbenchmark.

``bench.py`` measures the jitted step device-resident; the round-2 VERDICT
pointed out the actual driver loop paid an unmeasured per-step host sync
(every metric ``float()``'d each iteration).  This tool runs the driver's
own ``run_epoch`` (now pipelined one step deep via ``train/loop.py``) over
a host-side batch source and reports clips/s, isolating loop overhead from
host decode capacity:

  * ``--source cached`` (default): the loader yields preloaded host numpy
    batches — measures loop + shard + dispatch + metric-drain overhead.
    Steady-state within a few % of bench.py == the host sync is gone.
  * ``--source loader``: a real ClipLoader over the synthetic set with
    ``--device_augment`` host geometry — the honest end-to-end number on
    THIS host (decode/render-bound; see docs/RESULTS.md cores-per-chip
    math).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python -m dpc_tpu.train.bench_loop
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from dpc_tpu.core.config import DPCConfig, TrainConfig
from dpc_tpu.models import dpc as dpc_model
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import optim, pretrain_step
from dpc_tpu.train.metrics import MetricBundle
from dpc_tpu.train.pretrain import run_epoch


class CachedLoader:
    """Yields the same host batch ``n`` times (pure loop-overhead probe)."""

    def __init__(self, batch: np.ndarray, n: int):
        self.batch = batch
        self.n = n

    def __len__(self) -> int:
        return self.n

    def __iter__(self):
        for _ in range(self.n):
            yield self.batch


def _host_batch(args, m: DPCConfig) -> np.ndarray:
    """One host batch matching what the compiled step expects: uint8
    pre-crop windows with the recipe's geometry under --device_augment
    (the same contract for the cached AND device sources — benchmarking
    the DA step on f32 img_dim² noise would measure a path production
    never runs), f32 final-dim clips otherwise."""
    if args.device_augment:
        from dpc_tpu.data.device_augment import device_augment_geometry

        _, (wh, ww) = device_augment_geometry("synthetic", args.img_dim)
        return np.random.default_rng(0).integers(
            0, 255, (args.batch_size, m.num_seq, m.seq_len, wh, ww, 3),
            np.uint8)
    return np.random.default_rng(0).normal(size=(
        args.batch_size, m.num_seq, m.seq_len, args.img_dim,
        args.img_dim, 3)).astype(np.float32)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--img_dim", default=128, type=int)
    p.add_argument("--steps", default=40, type=int)
    p.add_argument("--source", default="cached",
                   choices=["cached", "loader", "device"])
    p.add_argument("--sync", action="store_true",
                   help="fetch every step's metrics eagerly (the round-2 "
                        "loop behaviour) — the A/B baseline for the "
                        "one-deep drain")
    p.add_argument("--device_augment", action="store_true")
    p.add_argument("--num_workers", default=8, type=int)
    args = p.parse_args(argv)

    m = DPCConfig(img_dim=args.img_dim, compute_dtype="bfloat16")
    t = TrainConfig(batch_size=args.batch_size, lr=1e-3, wd=1e-5,
                    device_augment=args.device_augment,
                    device_augment_recipe="crop_resize")
    mesh = meshlib.make_mesh(0)
    params = dpc_model.init_dpc(jax.random.PRNGKey(0), m)
    tx = optim.pretrain_optimizer(params, t.lr, t.wd, t.train_what)
    state = meshlib.replicate(mesh, pretrain_step.TrainState(
        params, tx.init(params), jnp.zeros((), jnp.int32)))
    raw_step = pretrain_step.make_pretrain_step(m, t, mesh, tx)
    n_dispatched = 0

    def step_fn(state, xb, key):
        # count real dispatches: a small loader can yield fewer than
        # --steps batches, and reporting clips/s over steps never run
        # would overstate throughput
        nonlocal n_dispatched
        n_dispatched += 1
        return raw_step(state, xb, key)
    if args.sync:
        inner_step = step_fn

        def step_fn(state, xb, key):  # noqa: F811 — eager-fetch baseline
            st, metrics = inner_step(state, xb, key)
            _ = {k: float(v) for k, v in metrics.items()}
            return st, metrics

    if args.source == "device":
        # device-resident batches: isolates the LOOP's host cost (dispatch
        # + metric fetch policy) from both host decode and the tunnel/PCIe
        # transfer.  With --sync (the round-2 per-step float()) every step
        # pays a host<->device round-trip; the drain hides it.
        batch = _host_batch(args, m)
        xb_dev = meshlib.shard_batch(mesh, jnp.asarray(batch))
        loader = CachedLoader(xb_dev, args.steps + 5)
    elif args.source == "cached":
        loader = CachedLoader(_host_batch(args, m), args.steps + 5)
    else:
        from dpc_tpu.core.config import DataConfig, ExperimentConfig
        from dpc_tpu.data.loader import ClipLoader
        from dpc_tpu.train.pretrain import get_dataset

        cfg = ExperimentConfig(model=m, train=t, data=DataConfig(
            dataset="synthetic", num_workers=args.num_workers,
            synthetic_num_videos=max(256, args.batch_size * 4)))
        loader = ClipLoader(get_dataset(cfg, "train"), args.batch_size,
                            num_workers=args.num_workers)

    key = jax.random.PRNGKey(1)
    # warm-up epoch: compile + loader spin-up (2 steps)
    state, _, _ = run_epoch(step_fn, state, loader, mesh, key, train=True,
                            print_freq=1000, max_steps=2)
    n_dispatched = 0
    t0 = time.perf_counter()
    state, meters, _ = run_epoch(step_fn, state, loader, mesh, key,
                                 train=True, print_freq=1000,
                                 max_steps=args.steps)
    # run_epoch drains the final step's metrics before returning, so the
    # wall time covers exactly the dispatched steps
    dt = time.perf_counter() - t0
    steps = n_dispatched
    clips_done = meters["loss"].count  # rows actually processed
    print(json.dumps({
        "metric": "end-to-end train clips/s (driver loop)",
        "value": round(clips_done / dt, 2),
        "unit": "clips/s",
        "source": args.source,
        "device_augment": args.device_augment,
        "steps": steps,
        "ms_per_step": round(dt / max(steps, 1) * 1e3, 2),
    }))
    if hasattr(loader, "close"):
        loader.close()


if __name__ == "__main__":
    main()
