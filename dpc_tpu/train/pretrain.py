"""DPC self-supervised pretraining driver.

CLI + epoch loop with capability parity with ``dpc/main.py``: flag set
(``:27-47``), train/validate epochs with NCE top-1/3/5 proxy metrics
(``:187-282``), tensorboard scalars + denormalised input-clip image grids
(``:155-164,200-206``), rolling latest+best checkpoints with resume and
transfer-pretrain loading (``:88-112,166-174``), hyperparameter-encoded
experiment directories (``:325-339``) — plus the config JSON serialised
into the run dir, which the reference never records.

Usage examples:
  python -m dpc_tpu.train.pretrain --dataset synthetic --epochs 2 \
      --batch_size 8 --img_dim 64
  python -m dpc_tpu.train.pretrain --dataset ucf101 --data_root /data \
      --net resnet18 --img_dim 128 --batch_size 128 --epochs 300
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from dpc_tpu.core import checkpoint as ckpt
from dpc_tpu.core.config import (DataConfig, DPCConfig, ExperimentConfig,
                                 TrainConfig, experiment_name)
from dpc_tpu.data import augment
# geometry contracts live beside the recipes they parameterize; re-exported
# here (their original home) for drivers/benchmarks/tests importing both ways
from dpc_tpu.data.device_augment import (  # noqa: F401
    dense_test_crop, device_augment_geometry)
from dpc_tpu.data.loader import ClipLoader
from dpc_tpu.data.synthetic import SyntheticVideoDataset
from dpc_tpu.data.video_dataset import make_dataset
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import loop, optim, pretrain_step
from dpc_tpu.train.loop import PreemptionGuard
from dpc_tpu.train.metrics import MetricBundle, denormalize
from dpc_tpu.utils import torch_compat


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DPC pretraining (TPU-native)")
    # reference flag set (dpc/main.py:27-47)
    p.add_argument("--net", default="resnet18")
    p.add_argument("--model", default="dpc-rnn")
    p.add_argument("--dataset", default="ucf101",
                   choices=["ucf101", "hmdb51", "k400", "synthetic"])
    p.add_argument("--seq_len", default=5, type=int)
    p.add_argument("--num_seq", default=8, type=int)
    p.add_argument("--pred_step", default=3, type=int)
    p.add_argument("--ds", default=3, type=int,
                   help="frame downsample rate (k400 forces 5)")
    p.add_argument("--batch_size", default=4, type=int,
                   help="GLOBAL batch size")
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--wd", default=1e-5, type=float)
    p.add_argument("--resume", default="", help="run dir to resume from")
    p.add_argument("--pretrain", default="",
                   help="checkpoint (.pth.tar or run dir) to transfer-load")
    p.add_argument("--epochs", default=10, type=int)
    p.add_argument("--start-epoch", default=0, type=int)
    p.add_argument("--print_freq", default=5, type=int)
    p.add_argument("--reset_lr", action="store_true")
    p.add_argument("--prefix", default="tmp")
    p.add_argument("--train_what", default="all", choices=["all", "last"])
    p.add_argument("--img_dim", default=128, type=int)
    # TPU-native additions
    p.add_argument("--data_root", default="")
    p.add_argument("--nce_impl", default="auto",
                   choices=["auto", "xla", "fused"],
                   help="NCE loss path: auto picks by projected score "
                        "bytes (XLA when it fits HBM, flash Pallas kernel "
                        "in the capacity regime)")
    p.add_argument("--negatives", default="local",
                   choices=["local", "global"])
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--num_devices", default=0, type=int)
    p.add_argument("--model_parallel", default=1, type=int,
                   help="mesh 'model' axis size: clips AND the NCE "
                        "candidate pool shard over it (each peer encodes "
                        "its own B/(d*m) sub-batch; embeddings regroup "
                        "for scoring), so {data:d, model:m} computes "
                        "exactly what {data:d} does on m* fewer chips "
                        "per group; requires --negatives global")
    p.add_argument("--cross_replica_bn", action="store_true")
    p.add_argument("--device_augment", action="store_true",
                   help="run crop/flip/gray/jitter on device inside the "
                        "step; host workers only decode+resize")
    p.add_argument("--fold_normalize", default="auto",
                   choices=["auto", "on", "off"],
                   help="fold the --device_augment Normalize into the "
                        "stem conv (PARITY.md #14). auto: off for the "
                        "stochastic pretrain recipes (measured -4.3%% on "
                        "chip; XLA already fuses the affine); on/off "
                        "force it")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--num_workers", default=8, type=int)
    p.add_argument("--prefetch", default=4, type=int,
                   help="batches each loader keeps decoded ahead")
    p.add_argument("--worker_mode", default="thread",
                   choices=["thread", "process"],
                   help="loader workers: threads (native GIL-free decode) "
                        "or a process pool (GIL-bound transform chains; "
                        "the reference's DataLoader strategy)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--synthetic_videos", default=32, type=int)
    p.add_argument("--unit_test", action="store_true",
                   help="32-video subsample for smoke runs")
    p.add_argument("--steps_per_epoch", default=0, type=int,
                   help="cap steps per epoch (0 = full epoch)")
    p.add_argument("--save_every_steps", default=0, type=int,
                   help="mid-epoch checkpoint interval (0 = per-epoch "
                        "only); resume continues from the exact batch")
    p.add_argument("--log_dir", default="log")
    p.add_argument("--profile", default="",
                   help="write a jax.profiler trace of epoch-0 steps here")
    p.add_argument("--debug_nans", action="store_true")
    p.add_argument("--compilation_cache", default="~/.cache/dpc_tpu/xla",
                   help="persistent XLA compilation cache dir: a "
                        "restarted (preempted) run skips the multi-minute "
                        "recompile; '' disables")
    p.add_argument("--multihost", action="store_true",
                   help="initialise jax.distributed; each host feeds its "
                        "shard of the global batch")
    return p


def config_from_args(args) -> ExperimentConfig:
    downsample = 5 if args.dataset == "k400" else args.ds  # dpc/main.py:293
    return ExperimentConfig(
        model=DPCConfig(img_dim=args.img_dim, num_seq=args.num_seq,
                        seq_len=args.seq_len, pred_step=args.pred_step,
                        network=args.net, compute_dtype=args.compute_dtype),
        data=DataConfig(dataset=args.dataset, data_root=args.data_root,
                        synthetic_num_videos=args.synthetic_videos,
                        downsample=downsample,
                        num_workers=args.num_workers,
                        worker_mode=args.worker_mode,
                        prefetch=args.prefetch),
        train=TrainConfig(batch_size=args.batch_size, lr=args.lr,
                          wd=args.wd, epochs=args.epochs,
                          start_epoch=args.start_epoch,
                          print_freq=args.print_freq,
                          train_what=args.train_what, prefix=args.prefix,
                          resume=args.resume, pretrain=args.pretrain,
                          reset_lr=args.reset_lr, seed=args.seed,
                          num_devices=args.num_devices,
                          model_parallel=args.model_parallel,
                          negatives=args.negatives,
                          nce_impl=args.nce_impl,
                          cross_replica_bn=args.cross_replica_bn,
                          device_augment=args.device_augment,
                          fold_normalize=args.fold_normalize,
                          device_augment_recipe=(
                              "sized_crop" if args.dataset == "k400"
                              else "crop_resize"),
                          remat=args.remat),
    )


def device_augment_window(cfg: ExperimentConfig) -> tuple[int, int]:
    """Host-side (h, w) window fed to the device augmenter."""
    return device_augment_geometry(cfg.data.dataset, cfg.model.img_dim)[1]


def get_dataset(cfg: ExperimentConfig, mode: str, unit_test: bool = False):
    m, d = cfg.model, cfg.data
    if cfg.train.device_augment:
        # host half of the split pipeline: decode + aspect-preserving
        # geometry only (short-side scale, then a PURE-SLICING random
        # window); all resampling and photometrics run on device
        # (data/device_augment.py).  Window geometry mirrors the
        # reference recipes: UCF/HMDB consistent 224-of-240 crop
        # (dpc/main.py:116-124), K400 a native-geometry window that the
        # device RandomSizedCrop draws from (dpc/main.py:126-133).
        big = d.dataset == "k400" and m.img_dim > 140
        short, win = device_augment_geometry(d.dataset, m.img_dim)
        # plan-capable: FrameClipDataset executes the scale+window INSIDE
        # the native JPEG decode (ROI decode), so the host transform
        # vanishes for frame trees; synthetic/fallback run its numpy path
        host_tf = augment.HostScaleCrop(short, win)
        if d.dataset == "synthetic":
            return SyntheticVideoDataset(
                transform=host_tf, num_videos=d.synthetic_num_videos,
                video_len=d.synthetic_video_len,
                frame_size=max(m.img_dim, 130),
                num_seq=m.num_seq, seq_len=m.seq_len,
                downsample=d.downsample, mode=mode,
                seed=1 if mode == "val" else 0)
        return make_dataset(d.dataset, d.data_root, mode, host_tf,
                            num_seq=m.num_seq, seq_len=m.seq_len,
                            downsample=d.downsample, big=big,
                            unit_test=unit_test,
                            val_subsample=d.val_subsample)
    if d.dataset == "synthetic":
        return SyntheticVideoDataset(
            transform=augment.Compose([
                augment.RandomSizedCrop(size=m.img_dim, consistent=True,
                                        p=1.0),
                augment.Normalize()]),
            num_videos=d.synthetic_num_videos,
            video_len=d.synthetic_video_len,
            frame_size=max(m.img_dim, 130),
            num_seq=m.num_seq, seq_len=m.seq_len,
            downsample=d.downsample, mode=mode,
            seed=1 if mode == "val" else 0)
    transform = augment.pretrain_transform(d.dataset, m.img_dim)
    big = d.dataset == "k400" and m.img_dim > 140  # dpc/main.py:288
    return make_dataset(d.dataset, d.data_root, mode, transform,
                        num_seq=m.num_seq, seq_len=m.seq_len,
                        downsample=d.downsample, big=big,
                        unit_test=unit_test,
                        val_subsample=d.val_subsample)


def run_epoch(step_fn, state, loader, mesh, key, *, train: bool,
              eval_fn=None, params_for_eval=None, print_freq: int = 5,
              epoch: int = 0, writer=None, iteration: int = 0,
              max_steps: int = 0, start_batch: int = 0,
              step_save_fn=None, save_every_steps: int = 0,
              guard=None, first_batch_fn=None):
    """One epoch over ``loader`` (the reference hot loop,
    ``dpc/main.py:187-246``), pipelined one step deep by the shared
    ``loop.run_epoch`` drain: metrics stay on device until the NEXT step
    has been dispatched, so the host never blocks the device between
    steps (converting them eagerly would round-trip the tunnel/PCIe
    every iteration).
    """
    meters = MetricBundle()
    box = {"state": state, "iteration": iteration}

    def dispatch(idx, batch):
        xb = meshlib.shard_batch(mesh, jnp.asarray(batch))
        if train:
            box["state"], metrics = step_fn(box["state"], xb, key)
            return metrics
        return eval_fn(params_for_eval, xb, jax.random.fold_in(key, idx))

    def print_fn(idx, metrics):
        if writer is not None and train:
            writer.add_scalar("local/loss", metrics["loss"],
                              box["iteration"])
            writer.add_scalar("local/accuracy", metrics["top1"],
                              box["iteration"])
            box["iteration"] += 1

    def save_fn(ep, batch_idx, block=True):
        # pass the LIVE state/iteration: the caller's copies only advance
        # when this function returns, and persisting a stale iteration
        # rewinds the TB scalar axis on mid-epoch resume
        step_save_fn(box["state"], ep, batch_idx, box["iteration"],
                     block=block)

    loop.run_epoch(dispatch, loader, meters,
                   mode="train" if train else "val",
                   print_freq=print_freq, epoch=epoch, print_fn=print_fn,
                   max_steps=max_steps, start_batch=start_batch,
                   step_save_fn=save_fn if step_save_fn else None,
                   save_every_steps=save_every_steps, guard=guard,
                   first_batch_fn=first_batch_fn, train=train)
    return box["state"], meters, box["iteration"]


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    m, t = cfg.model, cfg.train
    if args.debug_nans:
        from dpc_tpu.utils.profiling import enable_debug

        enable_debug(nan_checks=True)
    if args.compilation_cache:
        from dpc_tpu.utils.profiling import enable_compilation_cache

        enable_compilation_cache(args.compilation_cache)

    shard_id, num_shards = (meshlib.init_multihost() if args.multihost
                            else (0, 1))
    mesh = meshlib.make_mesh(t.num_devices, t.model_parallel)
    # clips shard over data AND model (pretrain_step._clip_layout), so
    # precheck the full device count — same depth evaluate.py rejects at
    n_dev = mesh.shape["data"] * mesh.shape.get("model", 1)
    print(f"devices: {dict(mesh.shape)} × {jax.devices()[0].platform}; "
          f"negatives={t.negatives}; dtype={m.compute_dtype}")
    if t.batch_size % n_dev:
        raise SystemExit(f"--batch_size {t.batch_size} must be divisible "
                         f"by {n_dev} devices")
    if t.batch_size % num_shards:
        raise SystemExit(f"--batch_size {t.batch_size} must be divisible "
                         f"by {num_shards} hosts")

    exp_dir = (args.resume if args.resume
               else os.path.join(args.log_dir,
                                 f"{args.prefix}_{experiment_name(cfg)}"))
    model_dir = os.path.join(exp_dir, "model")
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    # model + optimizer
    from dpc_tpu.models import dpc as dpc_model

    key = jax.random.PRNGKey(t.seed)
    params = dpc_model.init_dpc(key, m)
    tx = optim.pretrain_optimizer(params, t.lr, t.wd, t.train_what)
    if t.pretrain:
        params = ckpt.load_pretrained(t.pretrain, params,
                                      torch_compat.dpc_key_map)
    state = pretrain_step.TrainState(params, tx.init(params),
                                     jnp.zeros((), jnp.int32))

    mgr = ckpt.make_manager(model_dir)
    start_epoch, best_acc, iteration = t.start_epoch, 0.0, 0
    if args.resume:
        template = {"params": state.params, "opt_state": state.opt_state,
                    "step": state.step, "best_acc": 0.0, "iteration": 0}
        epoch0, payload = ckpt.restore_latest(mgr, template)
        if epoch0 is not None:
            params = payload["params"]
            if t.reset_lr:  # fresh optimizer, keep params
                state = pretrain_step.TrainState(
                    params, tx.init(params), jnp.zeros((), jnp.int32))
            else:
                state = pretrain_step.TrainState(
                    params, payload["opt_state"], payload["step"])
            best_acc = float(payload["best_acc"])
            iteration = int(payload["iteration"])
            start_epoch = epoch0
            print(f"resumed epoch {epoch0} (best_acc {best_acc:.4f})")
        else:
            # train-from-scratch INTO the resume dir, like the reference
            # (dpc/main.py:102) — but never silently
            print(f"[Warning] no checkpoint found at '{args.resume}'")

    # mid-epoch (step-level) checkpoints: preemption recovery beyond the
    # reference's epoch granularity (SURVEY §5 "failure detection")
    step_mgr = ckpt.make_manager(os.path.join(exp_dir, "model_steps"),
                                 keep_best=False) \
        if args.save_every_steps else None
    start_batch = 0
    if args.resume and step_mgr is not None:
        host = jax.device_get(state)
        template = {"params": host.params, "opt_state": host.opt_state,
                    "step": host.step, "epoch": 0, "batch_idx": 0,
                    "best_acc": 0.0, "iteration": 0}
        payload, start_epoch, start_batch = ckpt.resume_mid_epoch(
            step_mgr, template, start_epoch)
        if payload is not None:
            # --reset_lr wins here too: fresh optimizer, restored params
            # (the epoch-level branch above already honors it)
            opt = (tx.init(payload["params"]) if t.reset_lr
                   else payload["opt_state"])
            step0 = (jnp.zeros((), jnp.int32) if t.reset_lr
                     else payload["step"])
            state = pretrain_step.TrainState(payload["params"], opt, step0)
            best_acc = float(payload["best_acc"])
            iteration = int(payload["iteration"])
            print(f"resumed mid-epoch: epoch {start_epoch} "
                  f"batch {start_batch}")

    state = meshlib.replicate(mesh, state)
    step_fn = pretrain_step.make_pretrain_step(m, t, mesh, tx)
    eval_fn = pretrain_step.make_eval_step(m, t, mesh)

    # pre-compile; on HBM OOM retry with rematerialization (recompute
    # activations in the backward) instead of dying — remat costs ~2x step
    # time, so it is opt-in-or-fallback, never the default
    if not t.remat:
        if t.device_augment:
            wh, ww = device_augment_window(cfg)
            bshape = jax.ShapeDtypeStruct(
                (t.batch_size, m.num_seq, m.seq_len, wh, ww, 3),
                jnp.uint8)
        else:
            bshape = jax.ShapeDtypeStruct(
                (t.batch_size, m.num_seq, m.seq_len, m.img_dim,
                 m.img_dim, 3), jnp.float32)
        try:
            step_fn.lower(state, bshape,
                          jax.random.PRNGKey(0)).compile()
        except Exception as exc:
            if not loop.is_oom(exc):
                raise
            print("[memory] step does not fit HBM; retrying with "
                  "rematerialization (--remat)")
            import dataclasses as _dc

            t = _dc.replace(t, remat=True)
            step_fn = pretrain_step.make_pretrain_step(m, t, mesh, tx)

    per_host_batch = t.batch_size // num_shards
    train_loader = ClipLoader(get_dataset(cfg, "train", args.unit_test),
                              per_host_batch,
                              num_workers=cfg.data.num_workers,
                              worker_mode=cfg.data.worker_mode,
                              prefetch_batches=cfg.data.prefetch,
                              seed=t.seed, shard_id=shard_id,
                              num_shards=num_shards)
    val_loader = ClipLoader(get_dataset(cfg, "val", args.unit_test),
                            per_host_batch,
                            num_workers=cfg.data.num_workers,
                            worker_mode=cfg.data.worker_mode,
                            prefetch_batches=cfg.data.prefetch,
                            seed=t.seed + 1, shard_id=shard_id,
                            num_shards=num_shards)
    print(f"train videos: {len(train_loader.dataset)}; "
          f"val videos: {len(val_loader.dataset)}")

    writer_train = writer_val = None
    try:
        from tensorboardX import SummaryWriter

        writer_train = SummaryWriter(
            logdir=os.path.join(exp_dir, "img", "train"))
        writer_val = SummaryWriter(
            logdir=os.path.join(exp_dir, "img", "val"))
    except Exception as e:  # pragma: no cover
        print(f"tensorboard disabled: {e}")

    guard = PreemptionGuard().install() if step_mgr else None
    try:
        for epoch in range(start_epoch, t.epochs):
            train_loader.set_epoch(epoch)
            val_loader.set_epoch(epoch)
            ekey = jax.random.fold_in(jax.random.PRNGKey(t.seed), epoch)

            # log an input grid once per run (dpc/main.py:200-206), captured
            # from the first batch already in hand — a separate
            # next(iter(loader)) would spin up a throwaway prefetching
            # iterator and decode prefetch_batches of clips for one image
            def log_input_grid(sample):
                frames = sample[0].reshape(-1, *sample.shape[-3:])[:16]
                if frames.dtype == np.uint8:
                    # --device_augment feeds raw uint8 pre-crop windows;
                    # denormalize() would saturate them to white
                    grid = frames.astype(np.float32) / 255.0
                else:
                    grid = denormalize(frames)
                writer_train.add_images("input_seq", grid, epoch,
                                        dataformats="NHWC")

            grid_fn = (log_input_grid if writer_train is not None
                       and epoch == start_epoch else None)

            from dpc_tpu.utils.profiling import trace

            def save_mid_epoch(st, ep, batch_idx, live_iteration, block=True):
                def payload():
                    host = jax.device_get(st)
                    return {"params": host.params,
                            "opt_state": host.opt_state,
                            "step": host.step, "epoch": ep,
                            "batch_idx": batch_idx, "best_acc": best_acc,
                            "iteration": live_iteration}
                ckpt.save_step_unless_duplicate(
                    step_mgr,
                    ckpt.mid_epoch_step_id(ep, batch_idx,
                                           offset=live_iteration),
                    payload, block=block)

            # a preemption during VAL must still persist the finished train
            # epoch: save at the end-of-train-epoch position, so resume skips
            # the (already-run) train batches and lands in val + epoch save
            train_done = (min(len(train_loader), args.steps_per_epoch)
                          if args.steps_per_epoch else len(train_loader))

            def save_from_val(st, ep, _val_idx, live_iteration, block=True):
                save_mid_epoch(st, ep, train_done - 1, live_iteration,
                               block=block)

            with trace(args.profile if epoch == start_epoch else None):
                state, meters, iteration = run_epoch(
                    step_fn, state, train_loader, mesh, ekey, train=True,
                    print_freq=t.print_freq, epoch=epoch, writer=writer_train,
                    iteration=iteration, max_steps=args.steps_per_epoch,
                    start_batch=start_batch if epoch == start_epoch else 0,
                    step_save_fn=save_mid_epoch if step_mgr else None,
                    save_every_steps=args.save_every_steps, guard=guard,
                    first_batch_fn=grid_fn)
            _, vmeters, _ = run_epoch(
                step_fn, state, val_loader, mesh, ekey, train=False,
                eval_fn=eval_fn, params_for_eval=state.params,
                print_freq=t.print_freq, epoch=epoch, iteration=iteration,
                max_steps=args.steps_per_epoch,
                step_save_fn=save_from_val if step_mgr else None, guard=guard)

            tr, va = meters.local_averages(), vmeters.local_averages()
            print(f"epoch {epoch}: train loss {tr.get('loss', 0):.4f} "
                  f"top1 {tr.get('top1', 0):.4f} | val loss "
                  f"{va.get('loss', 0):.4f} top1 {va.get('top1', 0):.4f}")
            if writer_train is not None:
                for k, v in tr.items():
                    writer_train.add_scalar(f"global/{k}", v, epoch)
                for k, v in va.items():
                    writer_val.add_scalar(f"global/{k}", v, epoch)

            val_acc = va.get("top1", 0.0)
            best_acc = max(best_acc, val_acc)
            host_state = jax.device_get(state)
            ckpt.save(mgr, epoch + 1,
                      {"params": host_state.params,
                       "opt_state": host_state.opt_state,
                       "step": host_state.step,
                       "best_acc": best_acc, "iteration": iteration},
                      metrics={"val_acc": val_acc})
    finally:
        # TB event files buffer (default flush interval ~2 min); a
        # preemption SystemExit from run_epoch must not drop the run's
        # last scalars -- they are the forensic record of what the run
        # was doing when the scheduler killed it
        for w in (writer_train, writer_val):
            if w is not None:
                w.flush()
    if guard is not None:
        guard.uninstall()  # post-training code is interruptible again
    if step_mgr is not None:
        step_mgr.wait_until_finished()  # flush in-flight async step saves
    print(f"Training from ep {start_epoch} to ep {t.epochs} finished")


if __name__ == "__main__":
    main()
