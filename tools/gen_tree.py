"""Generate a synthetic JPEG frame tree in the reference's disk layout.

Used for host-pipeline benchmarks (`dpc_tpu.train.bench_input`) and the
golden data-layer tests when a real dataset is unavailable.  Layouts match
`/root/reference/process_data/readme.md` as consumed by
`dpc_tpu.data.video_dataset.make_dataset`:

  ucf101:  {root}/ucf101/frame/{class}/{video}/image_%05d.jpg  (1-based)
           + train_split01.csv + classInd.txt
  k400:    {root}/kinetics400[_256]/frame/... + train_split.csv
           + {root}/kinetics400/classInd.txt

Frames are smoothed noise (JPEG-compressible like natural video, unlike
white noise which inflates entropy-decode cost).

  python tools/gen_tree.py /tmp/k4_150 --dataset k400 --height 150 \
      --width 200 --videos 24 --frames 130
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np


def gen_tree(root: str, dataset: str, height: int, width: int,
             videos: int, frames: int, quality: int = 80,
             big: bool = False) -> str:
    rng = np.random.default_rng(0)
    if dataset == "k400":
        sub = "kinetics400_256" if big else "kinetics400"
        frame_root = os.path.join(root, sub, "frame")
        split_csv = os.path.join(root, sub, "train_split.csv")
        class_dir = os.path.join(root, "kinetics400")
    else:
        frame_root = os.path.join(root, dataset, "frame")
        split_csv = os.path.join(root, dataset, "train_split01.csv")
        class_dir = os.path.join(root, dataset)
    os.makedirs(class_dir, exist_ok=True)
    with open(os.path.join(class_dir, "classInd.txt"), "w") as f:
        f.write("1 classA\n")
    rows = []
    for v in range(videos):
        vdir = os.path.join(frame_root, "classA", f"v_{v:03d}")
        os.makedirs(vdir, exist_ok=True)
        # temporally-correlated smoothed noise: each frame drifts from
        # the last so JPEG sizes resemble natural video frames
        # sigma 1.5 calibrated to ~0.15 bytes/pixel at q80 — the
        # bytes/pixel of real extracted video frames (heavier blur
        # makes decode look unrealistically cheap)
        base = rng.integers(0, 256, (height, width, 3), np.uint8)
        base = cv2.GaussianBlur(base, (0, 0), 1.5)
        for i in range(frames):
            drift = rng.integers(0, 256, (height, width, 3), np.uint8)
            drift = cv2.GaussianBlur(drift, (0, 0), 1.5)
            frame = cv2.addWeighted(base, 0.5, drift, 0.5, 0)
            cv2.imwrite(os.path.join(vdir, f"image_{i + 1:05d}.jpg"),
                        frame, [cv2.IMWRITE_JPEG_QUALITY, quality])
            base = frame
        rows.append(f"{vdir}/,{frames}")
    with open(split_csv, "w") as f:
        f.write("\n".join(rows) + "\n")
    return root


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("--dataset", default="ucf101",
                   choices=["ucf101", "hmdb51", "k400"])
    p.add_argument("--height", default=240, type=int)
    p.add_argument("--width", default=320, type=int)
    p.add_argument("--videos", default=24, type=int)
    p.add_argument("--frames", default=130, type=int)
    p.add_argument("--quality", default=80, type=int)
    p.add_argument("--big", action="store_true",
                   help="k400: write under kinetics400_256")
    a = p.parse_args(argv)
    gen_tree(a.root, a.dataset, a.height, a.width, a.videos, a.frames,
             a.quality, a.big)
    print(f"tree at {a.root}: {a.videos}x{a.frames} "
          f"{a.width}x{a.height} q{a.quality}")


if __name__ == "__main__":
    main()
