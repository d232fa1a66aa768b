"""Dense-test host pipeline: decode-each-unique-frame-once A/B (round-4).

The reference samples ALL downsampled frames of a test video once and
builds overlapping windows by slicing the loaded tensor
(eval/dataset_3d_lc.py:76-78,95,109-125); until round 4 our
FrameClipDataset decoded every window occurrence, ~2x the decode work at
UCF's N/2 window stride.  This probe measures windows/s/core (CPU time,
contention-fair) for the dense-test host chain with and without the
dedupe, on a generated 240x320 q80 tree:

  a) production host chain: decode -> CenterCrop(224) -> Scale -> Normalize
  b) --device_augment host half: ROI decode of the center 224^2 only

    python tools/probes/probe_test_dedupe.py
"""

import time

import numpy as np

from dpc_tpu.data import augment, video_dataset

N_VIDEOS, VLEN, REPS = 4, 300, 3


def make_tree(root):
    import cv2
    recs = []
    rng = np.random.default_rng(0)
    for v in range(N_VIDEOS):
        d = root / "classA" / f"v_{v}"
        d.mkdir(parents=True)
        for i in range(VLEN):
            cv2.imwrite(str(d / f"image_{i + 1:05d}.jpg"),
                        rng.integers(0, 255, (240, 320, 3), np.uint8),
                        [cv2.IMWRITE_JPEG_QUALITY, 80])
        recs.append(video_dataset.VideoRecord(str(d), VLEN, label=0))
    return recs


def measure(ds, defeat_dedupe):
    orig = augment.frame_consistent
    if defeat_dedupe:
        augment.frame_consistent = lambda t: False
        # the planned (ROI) path dedupes unconditionally; defeat it by
        # restoring the pre-round-4 call shape (decode per occurrence)
        orig_planned = video_dataset.FrameClipDataset._load_frames_planned

        def planned_all(self, record, indices, rng):
            from dpc_tpu.core import shapes
            windows = shapes.test_time_windows(
                record.num_frames, self.num_seq, self.seq_len,
                self.downsample, self.window_stride)
            return orig_planned(self, record, windows, rng)

        video_dataset.FrameClipDataset._load_frames_planned = planned_all
    try:
        rng = np.random.default_rng(0)
        windows = 0
        t0 = time.process_time()
        for _ in range(REPS):
            for i in range(len(ds)):
                out = ds.sample(i, rng)
                clip = out[0] if isinstance(out, tuple) else out
                windows += clip.shape[0]
        dt = time.process_time() - t0
        return windows / dt
    finally:
        augment.frame_consistent = orig
        if defeat_dedupe:
            video_dataset.FrameClipDataset._load_frames_planned = \
                orig_planned


def main():
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as tmp:
        recs = make_tree(Path(tmp))
        cases = [
            ("full host test chain (center 224 -> 128, Normalize)",
             augment.finetune_transform(128, "test")),
            ("ROI decode to center 224^2 (--device_augment host half)",
             augment.HostScaleCrop(240, (224, 224), center=True)),
        ]
        for label, tf in cases:
            ds = video_dataset.FrameClipDataset(
                recs, tf, num_seq=8, seq_len=5, downsample=3,
                mode="test", return_label=True)
            old = measure(ds, defeat_dedupe=True)
            new = measure(ds, defeat_dedupe=False)
            print(f"{label}: {old:.1f} -> {new:.1f} windows/s/core "
                  f"({new / old:.2f}x)")


if __name__ == "__main__":
    main()
