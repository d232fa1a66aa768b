"""Downstream evaluation driver: finetune / linear-probe / dense test.

Capability parity with ``eval/test.py``: LC classifier over the pretrained
trunk, per-group LRs (``:76-83`` — the reference's *intent*; see
train/optim.py), multi-step-restart LR schedule (``:94-99``), transfer
loading of DPC checkpoints (``:149-158``), strict-then-partial test
loading (``:106-114``), dense test-time windowing with softmax averaging
over windows (``:303-342``), confusion matrix + markdown test log
(``:334-341``).

Usage examples:
  python -m dpc_tpu.train.evaluate --dataset synthetic --epochs 2 \
      --batch_size 8 --img_dim 64 --pretrain <run_dir>
  python -m dpc_tpu.train.evaluate --dataset ucf101 --data_root /data \
      --pretrain <run_dir> --train_what ft --epochs 300
  python -m dpc_tpu.train.evaluate --test <run_dir> --dataset ucf101 ...
"""

from __future__ import annotations

import argparse
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from dpc_tpu.core import checkpoint as ckpt
from dpc_tpu.core.config import (DataConfig, DPCConfig, EvalConfig,
                                 ExperimentConfig, TrainConfig)
from dpc_tpu.data import augment
from dpc_tpu.data.loader import ClipLoader
from dpc_tpu.data.synthetic import SyntheticVideoDataset
from dpc_tpu.data.video_dataset import make_dataset
from dpc_tpu.models import lc
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import finetune_step, loop, optim
from dpc_tpu.train.loop import PreemptionGuard
from dpc_tpu.train.metrics import (AccuracyTable, ConfusionMeter,
                                   MetricBundle, denormalize, write_log)
from dpc_tpu.utils import torch_compat

NUM_CLASSES = {"ucf101": 101, "hmdb51": 51, "synthetic": 8}
LR_MILESTONES = {  # eval/test.py:94-98
    ("hmdb51", None): (150, 250, 300),
    ("ucf101", 224): (300, 400, 500),
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="DPC finetune / linear-probe / test (TPU-native)")
    p.add_argument("--net", default="resnet18")
    p.add_argument("--model", default="lc")
    p.add_argument("--dataset", default="ucf101",
                   choices=["ucf101", "hmdb51", "synthetic"])
    p.add_argument("--num_class", default=0, type=int,
                   help="override the per-dataset class count")
    p.add_argument("--split", default=1, type=int)
    p.add_argument("--seq_len", default=5, type=int)
    p.add_argument("--num_seq", default=8, type=int)
    p.add_argument("--ds", default=3, type=int)
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--wd", default=1e-3, type=float)
    p.add_argument("--dropout", default=0.5, type=float)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--start-epoch", default=0, type=int)
    p.add_argument("--print_freq", default=5, type=int)
    p.add_argument("--reset_lr", action="store_true")
    p.add_argument("--prefix", default="tmp")
    p.add_argument("--train_what", default="ft", choices=["ft", "last"])
    p.add_argument("--img_dim", default=128, type=int)
    p.add_argument("--resume", default="")
    p.add_argument("--pretrain", default="",
                   help="DPC checkpoint (.pth.tar or run dir) for the trunk")
    p.add_argument("--test", default="",
                   help="LC checkpoint (run dir or .pth.tar) to test")
    # TPU-native additions
    p.add_argument("--data_root", default="")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--num_devices", default=0, type=int)
    p.add_argument("--model_parallel", default=1, type=int,
                   help="mesh 'model' axis size: clips shard over it in "
                        "the finetune/val steps and window rows in the "
                        "dense test (LC has no cross-sample loss term, so "
                        "no regroup collective is needed — see "
                        "finetune_step._clip_layout); lets a pod "
                        "provisioned {data x model} for pretraining run "
                        "the downstream driver on the same mesh shape")
    p.add_argument("--num_workers", default=8, type=int)
    p.add_argument("--prefetch", default=4, type=int,
                   help="batches each loader keeps decoded ahead")
    p.add_argument("--worker_mode", default="thread",
                   choices=["thread", "process"])
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--synthetic_videos", default=32, type=int)
    p.add_argument("--unit_test", action="store_true")
    p.add_argument("--steps_per_epoch", default=0, type=int)
    p.add_argument("--log_dir", default="log_eval")
    p.add_argument("--backbone_lr_scale", default=0.1, type=float)
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the LC forward (also the "
                        "automatic HBM-OOM fallback)")
    p.add_argument("--save_every_steps", default=0, type=int,
                   help="mid-epoch checkpoint interval (0 = per-epoch "
                        "only); resume continues from the exact batch — "
                        "the reference finetune recipe is 300 epochs "
                        "(eval/test.py:33), just as preemptible as "
                        "pretraining")
    p.add_argument("--test_keep_short", action="store_true",
                   help="evaluate videos shorter than one clip span via a "
                        "padded window instead of dropping them like the "
                        "reference (PARITY.md #10)")
    p.add_argument("--test_tail_window", action="store_true",
                   help="append a final tail window so trailing frames are "
                        "evaluated (the reference strides only, "
                        "PARITY.md #11)")
    p.add_argument("--window_batch", default=0, type=int,
                   help="dense-test pooled window rows per forward "
                        "(0 = 8 per data-axis device; rounded up to a "
                        "device multiple)")
    p.add_argument("--five_crop", action="store_true",
                   help="dense test with 4-corner+centre crops; crops "
                        "ride the window axis of the softmax average "
                        "(the reference's dormant path, "
                        "eval/dataset_3d_lc.py:98-107)")
    p.add_argument("--multihost", action="store_true",
                   help="initialise jax.distributed; each host feeds its "
                        "shard of the global batch")
    p.add_argument("--compilation_cache", default="~/.cache/dpc_tpu/xla",
                   help="persistent XLA compilation cache dir: a "
                        "restarted (preempted) run skips the multi-minute "
                        "recompile; '' disables")
    p.add_argument("--device_augment", action="store_true",
                   help="host workers only ROI-decode uint8 windows; the "
                        "finetune/val crop+flip+jitter runs inside the "
                        "jitted step (same split the pretrain driver "
                        "has; PARITY.md #12) and the dense-test "
                        "center/5-crop recipe inside the test forward "
                        "(bit-identical to the host chain; with "
                        "--five_crop the forward batch is 5x "
                        "--window_batch)")
    p.add_argument("--fold_normalize", default="auto",
                   choices=["auto", "on", "off"],
                   help="fold the --device_augment Normalize into the "
                        "stem conv (PARITY.md #14). auto: dense test "
                        "only (uint8 windows feed the stem, +5.8%% "
                        "measured; trades host-chain bit-identity for "
                        "rounding-level agreement) and off for the "
                        "stochastic finetune/val recipes (-3.3%% "
                        "measured); on/off force it")
    return p


def config_from_args(args) -> ExperimentConfig:
    num_classes = args.num_class or NUM_CLASSES[args.dataset]
    milestones = LR_MILESTONES.get(
        (args.dataset, args.img_dim if args.dataset == "ucf101" else None),
        LR_MILESTONES.get((args.dataset, None), (60, 80, 100)))
    return ExperimentConfig(
        model=DPCConfig(img_dim=args.img_dim, num_seq=args.num_seq,
                        seq_len=args.seq_len, network=args.net,
                        compute_dtype=args.compute_dtype),
        data=DataConfig(dataset=args.dataset, data_root=args.data_root,
                        synthetic_num_videos=args.synthetic_videos,
                        split=args.split, downsample=args.ds,
                        num_workers=args.num_workers,
                        worker_mode=args.worker_mode,
                        prefetch=args.prefetch,
                        test_keep_short=args.test_keep_short,
                        test_tail_window=args.test_tail_window),
        train=TrainConfig(batch_size=args.batch_size, seed=args.seed,
                          num_devices=args.num_devices,
                          model_parallel=args.model_parallel,
                          print_freq=args.print_freq),
        eval=EvalConfig(num_classes=num_classes, dropout=args.dropout,
                        train_what=args.train_what, lr=args.lr, wd=args.wd,
                        epochs=args.epochs, batch_size=args.batch_size,
                        lr_milestones=milestones,
                        backbone_lr_scale=args.backbone_lr_scale,
                        five_crop=args.five_crop, remat=args.remat,
                        device_augment=args.device_augment,
                        fold_normalize=args.fold_normalize,
                        reset_lr=args.reset_lr),
    )


def get_dataset(cfg: ExperimentConfig, mode: str, unit_test: bool = False):
    m, d = cfg.model, cfg.data
    five = cfg.eval.five_crop and mode == "test"
    if cfg.eval.device_augment:
        # host half of the split pipeline: ROI-decode only the window
        # the device recipe needs.  train/val: the full-geometry window
        # (the finetune RandomSizedCrop draws from the WHOLE frame,
        # eval/test.py:121-176, so the window is the frame at short side
        # 240), recipes in the jitted steps
        # (device_augment.finetune_augment_batch).  test: deterministic
        # — straight to the center 224² window (or the full geometry the
        # 5 crops are cut from), rest in the jitted forward
        # (device_augment.test_preprocess_batch, bit-identical to the
        # host chain)
        from dpc_tpu.data.device_augment import device_augment_geometry

        if mode == "test":
            task = "test_five" if five else "test"
        else:
            task = "finetune"
        short, win = device_augment_geometry(d.dataset, m.img_dim,
                                             task=task)
        host_tf = augment.HostScaleCrop(short, win,
                                        center=mode == "test")
        if d.dataset == "synthetic":
            return SyntheticVideoDataset(
                transform=host_tf, num_videos=d.synthetic_num_videos,
                video_len=d.synthetic_video_len,
                frame_size=max(m.img_dim, 130), num_seq=m.num_seq,
                seq_len=m.seq_len, downsample=d.downsample, mode=mode,
                return_label=True,
                num_classes=NUM_CLASSES["synthetic"],
                seed={"val": 2, "test": 3}.get(mode, 0),
                tail_window=d.test_tail_window)
        return make_dataset(d.dataset, d.data_root, mode, host_tf,
                            num_seq=m.num_seq, seq_len=m.seq_len,
                            downsample=d.downsample, split=d.split,
                            return_label=True, unit_test=unit_test,
                            val_subsample=d.val_subsample,
                            keep_short_test=d.test_keep_short,
                            tail_window=d.test_tail_window,
                            five_crop=five)
    if d.dataset == "synthetic":
        if mode == "test":
            tf = augment.Compose([
                augment.FiveCrop(m.img_dim) if five else
                augment.RandomSizedCrop(size=m.img_dim, consistent=True,
                                        p=0.0),
                augment.Normalize()])
        else:
            tf = augment.Compose([
                augment.RandomSizedCrop(size=m.img_dim, consistent=True,
                                        p=1.0),
                augment.Normalize()])
        return SyntheticVideoDataset(
            transform=tf, num_videos=d.synthetic_num_videos,
            video_len=d.synthetic_video_len,
            frame_size=max(m.img_dim, 130), num_seq=m.num_seq,
            seq_len=m.seq_len, downsample=d.downsample, mode=mode,
            return_label=True, num_classes=NUM_CLASSES["synthetic"],
            seed=2 if mode == "val" else (3 if mode == "test" else 0),
            tail_window=d.test_tail_window)
    tf = augment.finetune_transform(
        m.img_dim, mode if mode in ("train", "val") else "test",
        five_crop=five)
    return make_dataset(d.dataset, d.data_root, mode, tf,
                        num_seq=m.num_seq, seq_len=m.seq_len,
                        downsample=d.downsample, split=d.split,
                        return_label=True, unit_test=unit_test,
                        val_subsample=d.val_subsample,
                        keep_short_test=d.test_keep_short,
                        tail_window=d.test_tail_window,
                        five_crop=five)


def run_test(cfg: ExperimentConfig, params, bn_state, exp_dir: str,
             unit_test: bool = False, *, window_batch: int = 0,
             shard_id: int = 0, num_shards: int = 1
             ) -> tuple[float, float]:
    """Dense evaluation: every video → overlapping windows → softmax
    averaged over windows (and crops, when the transform is multi-crop) →
    top1/top5 + confusion matrix (``eval/test.py:303-342``).

    TPU-native execution: windows are pooled ACROSS videos into one fixed
    ``[WB, ...]`` batch shape, sharded over the mesh's 'data' axis — one
    compiled program, every device busy, host video decode prefetched on
    a worker thread.  The reference evaluates one video per step
    (batch_size=1 DataLoader, ``eval/test.py:381-387``).

    Multihost: each process evaluates the ``shard_id``-strided slice of
    the video list on its OWN local-device mesh (feeding host-local
    arrays into a global mesh is impossible), then per-video sums and the
    confusion matrix are all-gathered and reduced; only process 0 writes
    the artifacts.
    """
    import queue
    import threading

    e = cfg.eval
    ds = get_dataset(cfg, "test", unit_test)
    if num_shards > 1:
        # Per-host local mesh (host-local window arrays can't feed a
        # global mesh).  The test forward shards interchangeable window
        # ROWS over both axes, so the factorization is free — clamp the
        # model factor to one that divides THIS host's device count: a
        # pod-trained global --model_parallel (e.g. 8 across 2×4 hosts)
        # need not divide the local count, and must not crash the test
        # phase after training succeeded.
        local = jax.local_devices()
        if cfg.train.num_devices:
            local = local[:cfg.train.num_devices]
        mesh = meshlib.make_mesh(
            0, math.gcd(cfg.train.model_parallel, len(local)),
            devices=local)
    else:
        mesh = meshlib.make_mesh(cfg.train.num_devices,
                                 cfg.train.model_parallel)
    # params/bn_state arrive as host numpy after an Orbax/torch restore;
    # place them once — otherwise EVERY pooled-window flush re-ships the
    # whole model through the jit boundary (tens of MB per forward over
    # the remote tunnel, dwarfing the ~40 ms/fetch the one-deep pipeline
    # below exists to hide)
    params, bn_state = jax.device_put((params, bn_state),
                                      meshlib.replicated(mesh))
    # window rows shard over BOTH axes (finetune_step.
    # make_test_forward_sharded), so round the pooled batch to the full
    # device count
    n_dev = mesh.shape[meshlib.DATA_AXIS] * mesh.shape.get(
        meshlib.MODEL_AXIS, 1)
    wb = window_batch or 8 * n_dev
    wb = -(-wb // n_dev) * n_dev
    # --device_augment: uint8 window rows in, the forward expands each
    # row into its K=5 crops on device (host FiveCrop feeds crop rows
    # directly, so K=1 there); all row accounting below scales by K
    k_crops = 5 if (e.five_crop and e.device_augment) else 1
    from dpc_tpu.data.device_augment import dense_test_crop
    forward = finetune_step.make_test_forward_sharded(
        cfg.model, e, mesh,
        test_crop=dense_test_crop(cfg.data.dataset, cfg.model.img_dim))
    confusion = ConfusionMeter(e.num_classes)
    top1s, top5s, losses = [], [], []

    # host video loading overlaps device compute
    q: queue.Queue = queue.Queue(maxsize=4)

    def producer():
        rng = np.random.default_rng(0)
        try:
            for i in range(shard_id, len(ds), num_shards):
                q.put((i, ds.sample(i, rng)))
        except Exception as exc:  # pragma: no cover - surfaced below
            q.put(exc)
        finally:
            q.put(None)

    threading.Thread(target=producer, daemon=True).start()

    buf: list[np.ndarray] = []     # window slices pending a forward
    meta: list[tuple[int, int]] = []  # (video_idx, row count) per slice
    chunks: dict[int, list[np.ndarray]] = {}
    counts: dict[int, int] = {}
    labels: dict[int, int] = {}
    n_done = 0
    n_windows = 0
    tic = time.time()
    t_start = time.time()

    def finalize(vid: int) -> None:
        nonlocal n_done, tic
        logits = np.concatenate(chunks.pop(vid), axis=0)  # [nw, classes]
        label = labels.pop(vid)
        z = logits - logits.max(axis=-1, keepdims=True)
        probs = np.exp(z)
        probs /= probs.sum(axis=-1, keepdims=True)
        order = np.argsort(-probs.mean(axis=0))
        top1s.append(float(order[0] == label))
        top5s.append(float(label in order[:5]))
        mean_logits = logits.mean(axis=0)
        zl = mean_logits - mean_logits.max()
        losses.append(float(np.log(np.exp(zl).sum()) - zl[label]))
        confusion.update(np.asarray([order[0]]), np.asarray([label]))
        n_done += 1
        if n_done % 20 == 0:
            n_local = len(range(shard_id, len(ds), num_shards))
            print(f"[test] {n_done}/{n_local} acc so far "
                  f"{np.mean(top1s):.4f} ({time.time() - tic:.1f}s)")
            tic = time.time()

    def flush():
        nonlocal buf, meta, n_windows
        if not meta:
            return
        rows = np.concatenate(buf, axis=0)
        r = rows.shape[0]                # input window rows
        n_windows += r * k_crops         # logit rows (crops ride along)
        if r < wb:  # tail batch: pad with repeats, dropped below
            rows = np.concatenate(
                [rows, np.repeat(rows[-1:], wb - r, axis=0)])
        dev = forward(params, bn_state, jnp.asarray(rows))  # async dispatch
        if hasattr(dev, "copy_to_host_async"):
            # start the device->host logits copy now so drain()'s
            # np.asarray a flush later finds it already on host (same
            # overlap as loop.run_epoch; docs/RESULTS.md round-3 loop
            # study measured ~40 ms/fetch over the tunnel without it)
            dev.copy_to_host_async()
        drain()  # convert the PREVIOUS flush while this one computes
        pending.append((dev, r, meta))
        buf, meta = [], []

    def drain():
        # one-deep pipeline: device compute of flush k overlaps host
        # softmax/bookkeeping (and the device→host fetch) of flush k−1
        if not pending:
            return
        dev, r, metas = pending.pop()
        logits = np.asarray(dev)[:r * k_crops]
        ofs = 0
        for vid, cnt in metas:
            cnt *= k_crops  # device 5-crop: K contiguous rows per window
            chunks.setdefault(vid, []).append(logits[ofs:ofs + cnt])
            ofs += cnt
            if sum(a.shape[0] for a in chunks[vid]) == counts[vid]:
                finalize(vid)

    pending: list = []
    space = wb
    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, Exception):
            raise item
        vid, (clip, label) = item
        counts[vid], labels[vid] = clip.shape[0] * k_crops, int(label)
        ofs = 0
        while ofs < clip.shape[0]:
            take = min(space, clip.shape[0] - ofs)
            buf.append(clip[ofs:ofs + take])
            meta.append((vid, take))
            ofs += take
            space -= take
            if space == 0:
                flush()
                space = wb
    flush()
    drain()

    dt = time.time() - t_start
    if num_shards > 1:  # reduce per-video sums + confusion across hosts
        from jax.experimental import multihost_utils

        local = np.asarray([np.sum(top1s), np.sum(top5s), np.sum(losses),
                            len(top1s), n_windows], np.float64)
        tot = np.asarray(multihost_utils.process_allgather(local)
                         ).sum(axis=0)
        top1, top5 = float(tot[0] / tot[3]), float(tot[1] / tot[3])
        loss = float(tot[2] / tot[3])
        n_windows = int(tot[4])
        confusion.mat = np.asarray(
            multihost_utils.process_allgather(confusion.mat)
        ).sum(axis=0).astype(np.int64)
    else:
        top1, top5 = float(np.mean(top1s)), float(np.mean(top5s))
        loss = float(np.mean(losses))
    print(f"[test] loss {loss:.4f}; top1 {top1:.4f}; top5 {top5:.4f}")
    print(f"[test] {n_windows} windows / {len(ds)} videos in {dt:.1f}s = "
          f"{n_windows / dt:.1f} windows/s on {n_dev} device(s)/host "
          f"(WB={wb}, {num_shards} host(s))")
    if shard_id == 0:
        # per-class accuracy (the reference's acc_table printout,
        # eval/test.py:330-335), derived from the host-reduced confusion
        # matrix so multihost reports global — not shard-local — numbers
        table = AccuracyTable()
        for t_cls in range(e.num_classes):
            cnt = int(confusion.mat[:, t_cls].sum())
            if cnt:
                table.dict[t_cls] = {
                    "count": cnt,
                    "correct": int(confusion.mat[t_cls, t_cls])}
        table.print_table("test")
    if shard_id == 0:
        os.makedirs(exp_dir, exist_ok=True)
        confusion.plot_mat(os.path.join(exp_dir, "confusion_matrix.svg"))
        write_log(content=f"loss: {loss:.4f}; top1: {top1:.4f}; "
                  f"top5: {top5:.4f}",
                  epoch=0, filename=os.path.join(exp_dir, "test_log.md"))
    return loss, top1


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    m, e, t = cfg.model, cfg.eval, cfg.train
    if args.compilation_cache:
        from dpc_tpu.utils.profiling import enable_compilation_cache

        enable_compilation_cache(args.compilation_cache)

    shard_id, num_shards = (meshlib.init_multihost() if args.multihost
                            else (0, 1))
    mesh = meshlib.make_mesh(t.num_devices, t.model_parallel)
    n_dev = mesh.shape["data"] * mesh.shape.get("model", 1)
    if t.batch_size % n_dev:
        raise SystemExit(f"--batch_size {t.batch_size} must be divisible "
                         f"by {n_dev} devices")
    if t.batch_size % num_shards:
        raise SystemExit(f"--batch_size {t.batch_size} must be divisible "
                         f"by {num_shards} hosts")

    exp_dir = (args.resume if args.resume else os.path.join(
        args.log_dir,
        f"{args.prefix}_{args.dataset}-{m.img_dim}-sp{args.split}"
        f"_r{m.network[6:]}_lc_bs{t.batch_size}_lr{e.lr}"
        f"_wd{e.wd}_dp{e.dropout}_train-{e.train_what}"))
    model_dir = os.path.join(exp_dir, "model")
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    key = jax.random.PRNGKey(666)  # LC ctor seed (eval/model_3d_lc.py:16)
    params, bn_state = lc.init_lc(key, m, e.num_classes)

    # --test: load and evaluate densely, then exit (eval/test.py:106-129)
    if args.test:
        if args.test != "random":
            if ckpt.is_torch_file(args.test):
                params, _ = torch_compat.load_reference_checkpoint(
                    args.test, params, torch_compat.lc_key_map(params))
                bn_state, _ = torch_compat.load_reference_checkpoint(
                    args.test, bn_state,
                    torch_compat.lc_state_key_map(bn_state), verbose=False)
            else:
                mgr = ckpt.make_manager(os.path.join(args.test, "model"),
                                        read_only=True)
                step = mgr.best_step() or mgr.latest_step()
                if step is None:
                    raise SystemExit(f"no checkpoint under {args.test}")
                import orbax.checkpoint as ocp

                raw = mgr.restore(step, args=ocp.args.StandardRestore())
                params = ckpt.transfer_load(params, raw["params"],
                                            verbose=False)
                bn_state = ckpt.transfer_load(bn_state, raw["bn_state"],
                                              verbose=False)
                print(f"loaded test checkpoint epoch {step}")
        else:
            print("[warning] testing RANDOM weights")
        run_test(cfg, params, bn_state, exp_dir, args.unit_test,
                 window_batch=args.window_batch,
                 shard_id=shard_id, num_shards=num_shards)
        return

    if args.pretrain:
        # a DPC pretrain checkpoint transfers backbone+agg into LC
        # (neq_load_customized workflow, eval/test.py:149-158)
        # a torch FILE here is a reference DPC pretrain checkpoint (its
        # trunk keys need dpc_key_map); an Orbax run dir goes through
        # transfer_load's name matching.  Must use the same file
        # detection as load_pretrained itself — a '.pt' file picked the
        # LC map before, silently transferring ~0 tensors.
        params = ckpt.load_pretrained(args.pretrain, params,
                                      torch_compat.dpc_key_map
                                      if ckpt.is_torch_file(args.pretrain)
                                      else torch_compat.lc_key_map)

    tx = optim.finetune_optimizer(params, e.lr, e.wd, e.train_what,
                                  e.backbone_lr_scale)
    state = finetune_step.FinetuneState(params, bn_state, tx.init(params),
                                        jnp.zeros((), jnp.int32))
    mgr = ckpt.make_manager(model_dir)
    start_epoch, best_acc = args.start_epoch, 0.0
    if args.resume:
        template = {"params": state.params, "bn_state": state.state,
                    "opt_state": state.opt_state, "step": state.step,
                    "best_acc": 0.0}
        epoch0, payload = ckpt.restore_latest(mgr, template)
        if epoch0 is not None:
            if e.reset_lr:  # fresh optimizer, keep params+BN
                # (reference: skip loading the old optimizer,
                # eval/test.py:141)
                state = finetune_step.FinetuneState(
                    payload["params"], payload["bn_state"],
                    tx.init(payload["params"]), jnp.zeros((), jnp.int32))
            else:
                state = finetune_step.FinetuneState(
                    payload["params"], payload["bn_state"],
                    payload["opt_state"], payload["step"])
            best_acc = float(payload["best_acc"])
            start_epoch = epoch0
            print(f"resumed epoch {epoch0} (best_acc {best_acc:.4f})")
        else:
            # train-from-scratch INTO the resume dir, like the reference
            # (eval/test.py:147) — but never silently
            print(f"[Warning] no checkpoint found at '{args.resume}'")

    # trainability audit (the reference's requires_grad printout,
    # eval/test.py:86-89)
    import numpy as _np

    n_total = sum(_np.prod(x.shape) for x in jax.tree.leaves(params))
    trunk = sum(_np.prod(x.shape)
                for k in ("backbone", "agg")
                for x in jax.tree.leaves(params.get(k, {})))
    print(f"params: {n_total/1e6:.2f}M total; trunk {trunk/1e6:.2f}M "
          f"({'frozen' if e.train_what == 'last' else
             f'lr x{e.backbone_lr_scale}'}); head at full lr")

    # mid-epoch (step-level) checkpoints + preemption recovery: the
    # reference finetune recipe is 300 epochs (eval/test.py:33), just as
    # preemptible as pretraining (SURVEY §5 "failure detection")
    step_mgr = ckpt.make_manager(os.path.join(exp_dir, "model_steps"),
                                 keep_best=False) \
        if args.save_every_steps else None
    start_batch = 0
    if args.resume and step_mgr is not None:
        host = jax.device_get(state)
        template = {"params": host.params, "bn_state": host.state,
                    "opt_state": host.opt_state, "step": host.step,
                    "epoch": 0, "batch_idx": 0, "best_acc": 0.0}
        payload, start_epoch, start_batch = ckpt.resume_mid_epoch(
            step_mgr, template, start_epoch)
        if payload is not None:
            # --reset_lr wins here too: fresh optimizer, restored
            # params/BN (the epoch-level branch above already honors it)
            opt = (tx.init(payload["params"]) if e.reset_lr
                   else payload["opt_state"])
            step0 = (jnp.zeros((), jnp.int32) if e.reset_lr
                     else payload["step"])
            state = finetune_step.FinetuneState(
                payload["params"], payload["bn_state"], opt, step0)
            best_acc = float(payload["best_acc"])
            print(f"resumed mid-epoch: epoch {start_epoch} "
                  f"batch {start_batch}")

    state = meshlib.replicate(mesh, state)
    step_fn = finetune_step.make_finetune_step(m, e, mesh, tx)

    # pre-compile; on HBM OOM rebuild the step with rematerialization
    # (recompute activations in the backward) — same fallback as pretrain
    if not e.remat:
        if e.device_augment:
            from dpc_tpu.data.device_augment import device_augment_geometry

            _, (wh, ww) = device_augment_geometry(
                cfg.data.dataset, m.img_dim, task="finetune")
            bshape = jax.ShapeDtypeStruct(
                (cfg.train.batch_size, m.num_seq, m.seq_len, wh, ww, 3),
                jnp.uint8)
        else:
            bshape = jax.ShapeDtypeStruct(
                (cfg.train.batch_size, m.num_seq, m.seq_len, m.img_dim,
                 m.img_dim, 3), jnp.float32)
        lshape = jax.ShapeDtypeStruct((cfg.train.batch_size,), jnp.int32)
        try:
            step_fn.lower(state, bshape, lshape, jax.random.PRNGKey(0),
                          jnp.float32(1.0)).compile()
        except Exception as exc:
            if not loop.is_oom(exc):
                raise
            print("[memory] finetune step does not fit HBM; retrying "
                  "with rematerialization (--remat)")
            import dataclasses as _dc

            e = _dc.replace(e, remat=True)
            step_fn = finetune_step.make_finetune_step(m, e, mesh, tx)
    eval_fn = finetune_step.make_finetune_eval_step(m, e, mesh)

    writer_train = writer_val = None
    try:
        from tensorboardX import SummaryWriter

        writer_train = SummaryWriter(
            logdir=os.path.join(exp_dir, "img", "train"))
        writer_val = SummaryWriter(
            logdir=os.path.join(exp_dir, "img", "val"))
    except Exception as exc:  # pragma: no cover
        print(f"tensorboard disabled: {exc}")

    per_host_batch = cfg.train.batch_size // num_shards
    train_loader = ClipLoader(get_dataset(cfg, "train", args.unit_test),
                              per_host_batch,
                              num_workers=cfg.data.num_workers,
                              worker_mode=cfg.data.worker_mode,
                              prefetch_batches=cfg.data.prefetch,
                              seed=cfg.train.seed, shard_id=shard_id,
                              num_shards=num_shards)
    val_loader = ClipLoader(get_dataset(cfg, "val", args.unit_test),
                            per_host_batch,
                            num_workers=cfg.data.num_workers,
                            worker_mode=cfg.data.worker_mode,
                            prefetch_batches=cfg.data.prefetch,
                            seed=cfg.train.seed + 1, shard_id=shard_id,
                            num_shards=num_shards)
    print(f"train videos: {len(train_loader.dataset)}; "
          f"val videos: {len(val_loader.dataset)}")

    guard = PreemptionGuard().install() if step_mgr else None
    try:
        for epoch in range(start_epoch, e.epochs):
            train_loader.set_epoch(epoch)
            val_loader.set_epoch(epoch)
            lr_scale = optim.multistep_restart_lr(
                epoch, 1.0, e.lr_milestones, e.lr_gamma, e.lr_repeat)
            ekey = jax.random.fold_in(jax.random.PRNGKey(cfg.train.seed), epoch)
            meters, vmeters = MetricBundle(), MetricBundle()

            # denormalised input grid once per run, captured from the batch
            # already in hand (eval/test.py:232-238) — a separate
            # `next(iter(loader))` would spin up a throwaway prefetching
            # iterator and decode prefetch_batches for one image
            def log_input_grid(batch):
                clips = batch[0]
                frames = clips.reshape(-1, *clips.shape[-3:])[:16]
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

            def dispatch_train(idx, batch):
                nonlocal state
                clips, labels = batch
                xb = meshlib.shard_batch(mesh, jnp.asarray(clips))
                yb = meshlib.shard_batch(mesh, jnp.asarray(labels))
                state, metrics = step_fn(state, xb, yb, ekey,
                                         jnp.float32(lr_scale))
                return metrics

            def save_mid_epoch(ep, batch_idx, block=True):
                def payload():
                    host = jax.device_get(state)
                    return {"params": host.params, "bn_state": host.state,
                            "opt_state": host.opt_state, "step": host.step,
                            "epoch": ep, "batch_idx": batch_idx,
                            "best_acc": best_acc}
                ckpt.save_step_unless_duplicate(
                    step_mgr, ckpt.mid_epoch_step_id(ep, batch_idx),
                    payload, block=block)

            # a preemption during VAL must still persist the finished train
            # epoch: save at the end-of-train-epoch position, so resume skips
            # the (already-run) train batches and lands in val + epoch save
            train_done = (min(len(train_loader), args.steps_per_epoch)
                          if args.steps_per_epoch else len(train_loader))

            def save_from_val(ep, _val_idx, block=True):
                save_mid_epoch(ep, train_done - 1, block=block)

            loop.run_epoch(
                dispatch_train, train_loader, meters, mode="train",
                print_freq=cfg.train.print_freq, epoch=epoch,
                max_steps=args.steps_per_epoch,
                start_batch=start_batch if epoch == start_epoch else 0,
                step_save_fn=save_mid_epoch if step_mgr else None,
                save_every_steps=args.save_every_steps, guard=guard,
                first_batch_fn=grid_fn)

            def dispatch_val(idx, batch):
                clips, labels = batch
                return eval_fn(state.params, state.state,
                               meshlib.shard_batch(mesh, jnp.asarray(clips)),
                               meshlib.shard_batch(mesh, jnp.asarray(labels)),
                               jax.random.fold_in(ekey, idx))

            loop.run_epoch(dispatch_val, val_loader, vmeters, mode="val",
                           print_freq=cfg.train.print_freq, epoch=epoch,
                           max_steps=args.steps_per_epoch, train=False,
                           step_save_fn=save_from_val if step_mgr else None,
                           guard=guard)
            tr, va = meters.averages(), vmeters.averages()
            print(f"epoch {epoch}: train top1 {tr.get('top1', 0):.4f} | "
                  f"val top1 {va.get('top1', 0):.4f}")
            if writer_train is not None:
                for k, v in tr.items():
                    writer_train.add_scalar(f"global/{k}", v, epoch)
                for k, v in va.items():
                    writer_val.add_scalar(f"global/{k}", v, epoch)
                writer_train.add_scalar("lr/scale", lr_scale, epoch)
            val_acc = va.get("top1", 0.0)
            best_acc = max(best_acc, val_acc)
            host = jax.device_get(state)
            ckpt.save(mgr, epoch + 1,
                      {"params": host.params, "bn_state": host.state,
                       "opt_state": host.opt_state, "step": host.step,
                       "best_acc": best_acc},
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
    print(f"Finetune from ep {start_epoch} to ep {e.epochs} finished; "
          f"best val top1 {best_acc:.4f}")


if __name__ == "__main__":
    main()
