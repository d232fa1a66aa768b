"""Frame-tree video datasets: clip samplers over offline-extracted JPEGs.

Disk-layout contract (same as the reference, ``dpc/dataset_3d.py:97-106``):
each video is a directory of ``image_%05d.jpg`` (1-indexed) frames, and a
split CSV lists ``(video_dir, num_frames)`` rows.  Split CSVs and
``classInd.txt`` live under ``{data_root}/{dataset}/`` (the reference
hardcodes ``../process_data/data/...``; see ``dpc_tpu/data/preprocess.py``
for the tools that produce this layout).

Capabilities matched:
  * short-video filtering (``dpc/dataset_3d.py:76-82``);
  * uniform random clip start + stride lattice (``:88-95``);
  * val-split 30% subsample, deterministic seed 666 (``:84`` — the
    reference leaves the UCF val subsample unseeded, ``:184``; we seed
    both: reproducibility is a feature, the discrepancy is documented);
  * labels from ``classInd.txt``, 0-based (the reference pretrain dataset
    forgets the −1 on UCF ids, ``dpc/dataset_3d.py:166-174`` — latent since
    pretraining never reads labels; we always 0-base);
  * eval/test mode: dense all-frame sampling, non-overlapping seq_len
    blocks, half-overlapping windows of num_seq blocks
    (``eval/dataset_3d_lc.py:76-78,109-125``);
  * ``unit_test`` subsample of 32 videos (``dpc/dataset_3d.py:85``).
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from dpc_tpu.core import shapes
from dpc_tpu.data import augment
from dpc_tpu.data.augment import Compose

try:
    import cv2
    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False


def load_frame(path: str,
               target_hw: "tuple[int, int] | None" = None) -> np.ndarray:
    """Decode one JPEG to RGB uint8 [H, W, 3].

    With ``target_hw`` the decode is fused with the resize: the native
    libjpeg path (dpc_tpu/native) scales in the DCT domain — decoding a
    480p frame straight to 128² costs ~0.6 ms vs ~0.75 ms for
    decode-then-resize.  Falls back to cv2, then PIL.
    """
    from dpc_tpu import native

    if native.available():
        try:
            return native.decode_file(path, target_hw)
        except (ValueError, OSError):
            pass  # corrupt header etc. — retry with cv2 below
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if target_hw is not None:
            img = cv2.resize(img, (target_hw[1], target_hw[0]),
                             interpolation=cv2.INTER_LINEAR)
        return img
    from PIL import Image

    with Image.open(path) as im:
        out = np.asarray(im.convert("RGB"))
    if target_hw is not None:
        out = np.asarray(Image.fromarray(out).resize(
            (target_hw[1], target_hw[0])))
    return out


def read_split_csv(path: str) -> list[tuple[str, int]]:
    rows = []
    with open(path) as f:
        for row in csv.reader(f):
            if not row:
                continue
            rows.append((row[0], int(float(row[1]))))
    return rows


def read_class_index(path: str) -> dict[str, int]:
    """``classInd.txt``: 'id,name' or 'id name' rows, ids 1-based on disk,
    0-based in memory (``dpc/dataset_3d.py:47-56``)."""
    mapping: dict[str, int] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.replace(",", " ").split()
            mapping[parts[1]] = int(parts[0]) - 1
    return mapping


@dataclass
class VideoRecord:
    path: str
    num_frames: int
    label: int = -1


class FrameClipDataset:
    """Random-clip sampler over a list of video frame directories."""

    def __init__(self, records: list[VideoRecord], transform: Compose, *,
                 num_seq: int = 8, seq_len: int = 5, downsample: int = 3,
                 mode: str = "train", return_label: bool = False,
                 window_stride: Optional[int] = None,
                 class_names: Optional[dict[int, str]] = None,
                 decode_size: Optional[tuple[int, int]] = None,
                 decode_threads: int = 4,
                 keep_short_test: bool = False,
                 tail_window: bool = False):
        self.transform = transform
        self.decode_size = decode_size
        self.decode_threads = decode_threads
        self.num_seq = num_seq
        self.seq_len = seq_len
        self.downsample = downsample
        self.mode = mode
        self.return_label = return_label
        self.window_stride = window_stride or max(1, num_seq // 2)
        self.class_names = class_names or {}
        self.tail_window = tail_window
        span = shapes.clip_span(num_seq, seq_len, downsample)
        # the reference drops too-short videos from EVERY split, test
        # included (eval/dataset_3d_lc.py:61-67); keep_short_test=True
        # opts into evaluating them via a padded window (PARITY.md #10)
        if mode == "test" and keep_short_test:
            self.records = [r for r in records if r.num_frames > 0]
        else:
            self.records = [r for r in records if r.num_frames > span]

    def __len__(self) -> int:
        return len(self.records)

    def _frame_path(self, record: VideoRecord, idx: int) -> str:
        return os.path.join(record.path, f"image_{idx + 1:05d}.jpg")

    def _load_frames(self, record: VideoRecord,
                     indices: np.ndarray) -> np.ndarray:
        flat = indices.reshape(-1)
        # clamp defensively: CSV vlen can overcount by a frame
        flat = np.minimum(flat, record.num_frames - 1)
        paths = [self._frame_path(record, int(i)) for i in flat]
        batched = self._load_frames_native_batch(paths)
        if batched is not None:
            return batched
        return np.stack([load_frame(p, self.decode_size) for p in paths])

    def _load_frames_native_batch(self, paths: list) -> "np.ndarray | None":
        """Decode a whole clip in ONE native call (pthread pool, GIL
        released for the duration — the reference's answer to host feeding
        is 32 worker processes, ``dpc/main.py:311``; ours is batch decode
        that lets a thread-pool loader scale).  Returns None to fall back
        to the per-frame path (native unavailable, or a corrupt frame
        that needs the cv2/PIL retry chain)."""
        from dpc_tpu import native

        if not native.available():
            return None
        try:
            buffers = []
            for p in paths:
                with open(p, "rb") as f:
                    buffers.append(f.read())
            if self.decode_size is not None:
                th, tw = self.decode_size
            else:
                # frames of one video share dims (extraction contract);
                # a header-only probe of frame 0 sets the batch shape
                th, tw = native.jpeg_dims(buffers[0])
            out, failures = native.decode_jpeg_batch(
                buffers, th, tw, threads=self.decode_threads)
            if failures:
                return None  # per-frame path retries corrupt frames
            return out
        except (ValueError, OSError):
            return None

    def sample(self, index: int, rng: np.random.Generator):
        """Load + transform one item.

        train/val: ``[N, SL, H, W, 3]`` float32 (plus int label when
        ``return_label``).  test: ``[num_windows, N, SL, H, W, 3]``.
        """
        record = self.records[index]
        if self.mode == "test":
            windows = shapes.test_time_windows(
                record.num_frames, self.num_seq, self.seq_len,
                self.downsample, self.window_stride,
                tail_window=self.tail_window)
            nw = windows.shape[0]
            # Decode (and transform) each unique frame ONCE: at UCF's
            # N/2 window stride interior blocks appear in ~2 windows
            # (HMDB ~4/3), and the reference samples all frames once and
            # windows by slicing the loaded tensor
            # (eval/dataset_3d_lc.py:76-78,95,109-125).  Valid whenever
            # the transform is frame-consistent (always true for the
            # dense-test recipes); the inverse gather restores the
            # flattened window order bit-exactly.
            flat = np.minimum(windows.reshape(-1), record.num_frames - 1)
            uniq, inverse = np.unique(flat, return_inverse=True)
            clip = None
            if hasattr(self.transform, "plan"):
                # --device_augment dense test: the deterministic window
                # plan executes inside the native ROI decode, same as
                # the train path below (plans are per-clip, so dedupe
                # is always exact here)
                clip = self._load_frames_planned(record, uniq, rng)
                if clip is not None:
                    clip = clip[inverse]
            if clip is None:
                if augment.frame_consistent(self.transform):
                    frames = self._load_frames(record, uniq)
                    # gather on the frame axis (-4): plain transforms
                    # return [U, h, w, c], multi-crop [k, U, h, w, c]
                    clip = np.take(self.transform(frames, rng), inverse,
                                   axis=-4)
                else:
                    frames = self._load_frames(record, windows)
                    clip = self.transform(frames, rng)
            h, w, c = clip.shape[-3:]
            # multi-crop transforms (FiveCrop) return [k, T, h, w, c]:
            # crops ride the window axis (eval/dataset_3d_lc.py:117-121)
            clip = clip.reshape(-1, self.num_seq, self.seq_len, h, w, c)
            assert clip.shape[0] % nw == 0
            return (clip, record.label) if self.return_label else clip

        start = shapes.sample_clip_start(rng, record.num_frames,
                                         self.num_seq, self.seq_len,
                                         self.downsample)
        assert start is not None, record.path
        indices = shapes.clip_block_indices(start, self.num_seq,
                                            self.seq_len, self.downsample)
        clip = None
        if hasattr(self.transform, "plan"):
            clip = self._load_frames_planned(record, indices, rng)
        if clip is None:
            frames = self._load_frames(record, indices)
            clip = self.transform(frames, rng)
        h, w, c = clip.shape[-3:]
        clip = clip.reshape(self.num_seq, self.seq_len, h, w, c)
        return (clip, record.label) if self.return_label else clip

    def _load_frames_planned(self, record: VideoRecord,
                             indices: np.ndarray, rng
                             ) -> "np.ndarray | None":
        """Execute a plan-capable geometry transform (augment.HostScaleCrop)
        INSIDE the native batch decode: short-side scale + the consistent
        crop window happen in the entropy decoder, so the host transform
        is gone entirely.  Returns None to fall back to the full
        decode + numpy path (native unavailable, non-JPEG payloads,
        portrait frames needing padding) — the fallback consumes fresh
        rng draws, which is fine: any consistent window is a valid
        sample."""
        from dpc_tpu import native

        if not native.available():
            return None
        try:
            flat = np.minimum(indices.reshape(-1), record.num_frames - 1)
            # plan from the FIRST frame's header before reading the rest:
            # frames of one video share dims (extraction contract), and a
            # video the transform can't plan (e.g. portrait needing
            # padding) would otherwise have all its frames read, thrown
            # away, and re-read by the fallback on every sample
            with open(self._frame_path(record, int(flat[0])), "rb") as f:
                first = f.read()
            src_hw = native.jpeg_dims(first)
            plan = self.transform.plan(src_hw, rng)
            if plan is None:
                return None
            buffers = [first]
            for i in flat[1:]:
                with open(self._frame_path(record, int(i)), "rb") as f:
                    buffers.append(f.read())
            short, crop = plan
            out, failures = native.decode_jpeg_batch_scale_crop(
                buffers, short, crop, threads=self.decode_threads)
            if failures:
                return None  # corrupt frame: retry via cv2/PIL chain
            return out
        except (ValueError, OSError):
            return None


def _subsample(records: list[VideoRecord], frac: float,
               seed: int = 666) -> list[VideoRecord]:
    rng = np.random.default_rng(seed)
    n = max(1, int(round(len(records) * frac)))
    idx = rng.permutation(len(records))[:n]
    return [records[i] for i in sorted(idx)]


def _labelled_records(rows: list[tuple[str, int]],
                      encode: dict[str, int]) -> list[VideoRecord]:
    recs = []
    for vpath, vlen in rows:
        # action name is the class directory above the video dir
        parts = os.path.normpath(vpath).split(os.sep)
        label = -1
        for p in reversed(parts[:-1]):
            if p in encode:
                label = encode[p]
                break
        recs.append(VideoRecord(vpath, vlen, label))
    return recs


def make_dataset(dataset: str, data_root: str, mode: str,
                 transform: Compose, *, num_seq: int = 8, seq_len: int = 5,
                 downsample: int = 3, split: int = 1, big: bool = False,
                 return_label: bool = False, unit_test: bool = False,
                 val_subsample: float = 0.3,
                 decode_size: Optional[tuple[int, int]] = None,
                 keep_short_test: bool = False,
                 tail_window: bool = False,
                 five_crop: bool = False) -> FrameClipDataset:
    """Factory covering ucf101 / hmdb51 / k400 split conventions.

    ucf101/hmdb51: ``{root}/{name}/{mode}_split{split:02d}.csv``
    (``dpc/dataset_3d.py:155-165``); k400: ``{root}/kinetics400[_256]/
    {train|val}_split.csv`` with downsample typically 5
    (``dpc/dataset_3d.py:59-74``, ``dpc/main.py:293``).
    """
    if dataset == "k400":
        sub = "kinetics400_256" if big else "kinetics400"
        split_file = os.path.join(
            data_root, sub,
            "train_split.csv" if mode == "train" else "val_split.csv")
        class_file = os.path.join(data_root, "kinetics400", "classInd.txt")
    elif dataset in ("ucf101", "hmdb51"):
        # the reference uses the TEST split for val too, 30%-subsampled
        # (dpc/dataset_3d.py:157-163,184; eval/dataset_3d_lc.py:41-46,69)
        part = "train" if mode == "train" else "test"
        split_file = os.path.join(data_root, dataset,
                                  f"{part}_split{split:02d}.csv")
        class_file = os.path.join(data_root, dataset, "classInd.txt")
    else:
        raise ValueError(f"unknown dataset {dataset!r}")

    rows = read_split_csv(split_file)
    encode = read_class_index(class_file) if os.path.exists(class_file) \
        else {}
    records = _labelled_records(rows, encode)
    if mode == "val" and val_subsample < 1.0:
        records = _subsample(records, val_subsample)
    if unit_test:
        records = _subsample(records, min(1.0, 32 / max(len(records), 1)))
    names = {v: k for k, v in encode.items()}
    # dense-test window stride: UCF always N/2; HMDB N/2 in the
    # multi-crop branch but 3N/4 in the plain branch
    # (eval/dataset_3d_lc.py:119,124 vs :249,254)
    window_stride = (3 * num_seq // 4
                     if dataset == "hmdb51" and not five_crop
                     else num_seq // 2)
    return FrameClipDataset(records, transform, num_seq=num_seq,
                            seq_len=seq_len, downsample=downsample,
                            mode=mode, return_label=return_label,
                            window_stride=window_stride, class_names=names,
                            decode_size=decode_size,
                            keep_short_test=keep_short_test,
                            tail_window=tail_window)
