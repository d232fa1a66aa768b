"""Offline preprocessing: video → JPEG frame trees + split CSVs.

Capability parity with ``process_data/src/{extract_frame,write_csv}.py``:
decode each video with OpenCV, resize so the short side hits a per-dataset
target (UCF/HMDB 240px at ~30% JPEG-size saving, K400 150px or 256px
"big"), write ``image_%05d.jpg`` (1-indexed, quality 80), then walk the
official split files and emit ``(video_dir, num_frames)`` CSVs.

Improvements over the reference (documented, not silently different):
  * resumable per-video: a ``.done`` marker is written after the last frame,
    so an interrupted run redoes only the video it was in (the reference
    skips any existing dir, leaving a truncated video behind —
    ``extract_frame.py:82-89`` warns you to delete it manually);
  * corrupt/unreadable videos are recorded in ``failed.txt`` instead of a
    lost stdout line (``extract_frame.py:23-24``);
  * the Kinetics CSV path of the reference references pd/tqdm/Parallel it
    never imports (``write_csv.py:58-75``) — functional here.
"""

from __future__ import annotations

import csv
import glob
import os
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Iterable, Optional

import cv2


def resize_dims(w: int, h: int, short_side: int) -> tuple[int, int]:
    """Target (width, height) so min(w, h) == short_side, aspect kept
    (``extract_frame.py:39-44``)."""
    if w >= h:
        return int(round(w * short_side / h)), short_side
    return short_side, int(round(h * short_side / w))


def extract_video(video_path: str, out_dir: str, short_side: int = 256,
                  quality: int = 80) -> int:
    """Decode one video into ``out_dir/image_%05d.jpg``.  Returns the frame
    count (0 on failure).  Resumable: skips when ``.done`` exists."""
    done_marker = os.path.join(out_dir, ".done")
    if os.path.exists(done_marker):
        return len(glob.glob(os.path.join(out_dir, "*.jpg")))
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        return 0
    params = [cv2.IMWRITE_JPEG_QUALITY, quality]
    count = 0
    size: Optional[tuple[int, int]] = None
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if size is None:
            h, w = frame.shape[:2]
            size = resize_dims(w, h, short_side)
        if (frame.shape[1], frame.shape[0]) != size:
            frame = cv2.resize(frame, size, interpolation=cv2.INTER_LINEAR)
        count += 1
        cv2.imwrite(os.path.join(out_dir, f"image_{count:05d}.jpg"),
                    frame, params)
    cap.release()
    if count > 0:
        with open(done_marker, "w") as f:
            f.write(str(count))
    return count


def extract_tree(video_root: str, out_root: str, short_side: int,
                 extensions: Iterable[str] = (".avi", ".mp4", ".webm"),
                 num_workers: int = 8, use_processes: bool = True) -> None:
    """Extract every video under ``video_root`` (class-dir layout) into
    ``out_root/<class>/<video-stem>/`` frame dirs, in parallel."""
    jobs = []
    for dirpath, _, files in os.walk(video_root):
        for fname in sorted(files):
            if os.path.splitext(fname)[1].lower() in extensions:
                rel = os.path.relpath(dirpath, video_root)
                stem = os.path.splitext(fname)[0]
                jobs.append((os.path.join(dirpath, fname),
                             os.path.join(out_root, rel, stem)))
    pool_cls = ProcessPoolExecutor if use_processes else ThreadPoolExecutor
    failed = []
    with pool_cls(num_workers) as pool:
        futures = {pool.submit(extract_video, src, dst, short_side): src
                   for src, dst in jobs}
        for fut, src in futures.items():
            if fut.result() == 0:
                failed.append(src)
    if failed:
        with open(os.path.join(out_root, "failed.txt"), "a") as f:
            f.write("\n".join(failed) + "\n")
    print(f"extracted {len(jobs) - len(failed)}/{len(jobs)} videos "
          f"→ {out_root}")


def count_frames(video_dir: str) -> int:
    return len(glob.glob(os.path.join(video_dir, "*.jpg")))


def write_split_csv(video_dirs: list[str], out_csv: str,
                    num_workers: int = 8) -> int:
    """Emit ``(video_dir, num_frames)`` rows; drops empty dirs
    (``write_csv.py:5-10,46-52``)."""
    os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
    with ThreadPoolExecutor(num_workers) as pool:
        counts = list(pool.map(count_frames, video_dirs))
    kept = 0
    with open(out_csv, "w", newline="") as f:
        writer = csv.writer(f)
        for vdir, n in zip(video_dirs, counts):
            if n > 0:
                writer.writerow([vdir, n])
                kept += 1
    print(f"wrote {kept}/{len(video_dirs)} rows → {out_csv}")
    return kept


def ucf_split_to_dirs(split_file: str, frame_root: str) -> list[str]:
    """Official UCF101 ``trainlist0X.txt``/``testlist0X.txt`` → frame dirs
    (``write_csv.py:12-32``)."""
    dirs = []
    with open(split_file) as f:
        for line in f:
            line = line.strip().split(" ")[0]
            if not line:
                continue
            rel = os.path.splitext(line)[0]  # ClassName/v_...avi
            dirs.append(os.path.join(frame_root, rel))
    return dirs


def class_dirs_to_dirs(frame_root: str) -> list[str]:
    """All video dirs under a class-dir frame tree (the K400 convention)."""
    return sorted(
        d for d in glob.glob(os.path.join(frame_root, "*", "*"))
        if os.path.isdir(d))


def write_class_index(class_names: list[str], out_path: str) -> None:
    """``classInd.txt`` with 1-based ids, matching the UCF format."""
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        for i, name in enumerate(sorted(class_names)):
            f.write(f"{i + 1},{name}\n")
