"""Input-pipeline throughput benchmark (host side).

The reference's bottleneck crutch is 32 DataLoader worker processes each
decoding 40 JPEGs + running the PIL transform chain per sample (SURVEY §7
hard-part 4).  This tool measures OUR host pipeline in clips/sec so the
host-vs-chip balance is visible:

  python -m dpc_tpu.train.bench_input --dataset synthetic
  python -m dpc_tpu.train.bench_input --dataset ucf101 --data_root /data
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data_root", default="")
    p.add_argument("--img_dim", default=128, type=int)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--num_workers", default=8, type=int)
    p.add_argument("--worker_mode", default="thread",
                   choices=["thread", "process"])
    p.add_argument("--decode_only", action="store_true",
                   help="decode+resize only (the --device_augment host "
                        "profile); default runs the full host transform")
    p.add_argument("--no_roi", action="store_true",
                   help="with --decode_only: full decode + numpy slicing "
                        "instead of the fused ROI decode (A/B baseline)")
    p.add_argument("--num_seq", default=8, type=int)
    p.add_argument("--seq_len", default=5, type=int)
    p.add_argument("--task", default="pretrain",
                   choices=["pretrain", "finetune", "test", "test_five"],
                   help="with --decode_only: which driver's host window "
                        "to decode to (finetune/test_five = "
                        "full-geometry window, test = the center 224² "
                        "the dense test keeps)")
    p.add_argument("--batches", default=8, type=int)
    args = p.parse_args(argv)

    from dpc_tpu.data import augment
    from dpc_tpu.data.loader import ClipLoader

    if args.decode_only:
        # the --device_augment host profile: short-side scale + window,
        # executed INSIDE the native ROI decode (augment.HostScaleCrop;
        # --no_roi forces the old full-decode + numpy-slice path for A/B)
        from dpc_tpu.data.device_augment import device_augment_geometry

        short, win = device_augment_geometry(args.dataset, args.img_dim,
                                             task=args.task)
        center = args.task.startswith("test")
        transform = augment.HostScaleCrop(short, win, center=center)
        if args.no_roi:
            transform = augment.Compose([
                augment.Scale(short), augment.PadTo(*win),
                augment.CenterCrop(win) if center else
                augment.RandomCrop(win, consistent=True)])
        decode_size = None
    else:
        transform = augment.pretrain_transform(
            "k400" if args.dataset == "synthetic" else args.dataset,
            args.img_dim)
        decode_size = None

    if args.dataset == "synthetic":
        from dpc_tpu.data.synthetic import SyntheticVideoDataset

        ds = SyntheticVideoDataset(
            transform=transform,
            # +1 batch: the warm-up next(it) below consumes one
            num_videos=max(256, args.batch_size * (args.batches + 1)),
            video_len=256, frame_size=150)
    else:
        from dpc_tpu.data.video_dataset import make_dataset

        ds = make_dataset(args.dataset, args.data_root, "train", transform,
                          num_seq=args.num_seq, seq_len=args.seq_len,
                          big=args.dataset == "k400" and args.img_dim > 140,
                          decode_size=decode_size)

    loader = ClipLoader(ds, args.batch_size, num_workers=args.num_workers,
                        worker_mode=args.worker_mode)
    it = iter(loader)
    t0, dt = time.perf_counter(), 0.0

    def nxt():
        """Next batch, cycling the iterator with the clock paused:
        re-warming the worker pool on a small benchmark tree is not
        steady-state input cost (measured 5-10x understatement on a
        24-video tree otherwise).  The batch fetched right after a
        cycle absorbs the pool spin-up, so it comes back flagged
        untimed and the caller must not count it."""
        nonlocal it, t0, dt
        try:
            return next(it), True
        except StopIteration:
            dt += time.perf_counter() - t0
            it = iter(loader)
            try:
                batch = next(it)  # re-warm batch, untimed
            except StopIteration:
                raise SystemExit(
                    "loader yields zero batches (batch_size larger than "
                    "the dataset with drop_last); shrink --batch_size or "
                    "grow the tree")
            t0 = time.perf_counter()
            return batch, False

    nxt()  # warm the pool
    t0, dt, n = time.perf_counter(), 0.0, 0
    for _ in range(args.batches):
        batch, timed = nxt()
        if not timed:
            continue  # pool re-warm batch: excluded from clips AND clock
        n += batch.shape[0] if not isinstance(batch, tuple) \
            else batch[0].shape[0]
    dt += time.perf_counter() - t0
    if n == 0 or dt <= 0:
        raise SystemExit(
            "no steady-state batches measured: every epoch ended at one "
            "batch, so all fetches were pool re-warms; shrink "
            "--batch_size or grow the tree")
    print(json.dumps({
        "metric": "input clips/sec (host)",
        "value": round(n / dt, 2),
        "unit": "clips/s",
        "workers": args.num_workers,
        "worker_mode": args.worker_mode,
        "decode_only": args.decode_only,
        "roi_decode": args.decode_only and not args.no_roi,
    }))
    loader.close()


if __name__ == "__main__":
    main()
