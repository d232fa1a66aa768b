"""Golden data-layer parity vs the live reference dataset classes.

Runs the ACTUAL reference code (``dpc/dataset_3d.py::UCF101_3d``,
``eval/dataset_3d_lc.py::UCF101_3d/HMDB51_3d``) over a tiny generated
frame tree and asserts our sampler algebra (`core/shapes.py`) and dataset
classes (`data/video_dataset.py`) produce identical populations, train
index lattices, and test-mode window index sets.

Frames are PNG payloads named ``image_%05d.jpg`` (both loaders sniff the
real format) whose every pixel equals the 0-based frame index — lossless,
so decoded pixel values read the index lattice straight back out of
``__getitem__``'s output tensor.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
import torch
from PIL import Image

from tests.ref_harness import ref_dataset_modules

from dpc_tpu.core import shapes
from dpc_tpu.data import video_dataset

# small geometry that still exercises non-trivial windowing:
# span = 3*2*2 = 12; HMDB window_stride = 3*3//4 = 2 (tail-sensitive)
NUM_SEQ, SEQ_LEN, DS = 3, 2, 2
# (class, video, length): one exactly-span video (dropped), one minimal
# keeper, one where the HMDB stride misses the last block (tail case)
VIDEOS = [("ApplyLipstick", "v_a1", 12),
          ("ApplyLipstick", "v_a2", 13),
          ("Archery", "v_b1", 30),
          ("Archery", "v_b2", 47)]


def _ref_transform(seq):
    """[PIL] -> [CHW float tensor], no augmentation."""
    return [torch.from_numpy(np.asarray(im, np.float32)).permute(2, 0, 1)
            for im in seq]


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """Reference-layout tree: ``<root>/process_data/data/<ds>/`` CSVs +
    classInd + frame dirs, frames encoding their index."""
    root = tmp_path_factory.mktemp("refdata")
    for ds in ("ucf101", "hmdb51"):
        base = root / "process_data" / "data" / ds
        base.mkdir(parents=True)
        classes = sorted({c for c, _, _ in VIDEOS})
        with open(base / "classInd.txt", "w") as f:
            for i, c in enumerate(classes):
                f.write(f"{i + 1} {c}\n")
        rows = []
        for cls, vid, vlen in VIDEOS:
            vdir = base / "frame" / cls / vid
            vdir.mkdir(parents=True)
            for i in range(vlen):
                arr = np.full((8, 8, 3), i, np.uint8)
                # PNG payload under a .jpg name: lossless index encoding
                Image.fromarray(arr).save(vdir / f"image_{i + 1:05d}.jpg",
                                          format="PNG")
            rows.append((str(vdir) + "/", vlen))
        for split in ("train_split01.csv", "test_split01.csv"):
            with open(base / split, "w") as f:
                for p, n in rows:
                    f.write(f"{p},{n}\n")
    # the reference resolves splits relative to cwd ('../process_data/...')
    (root / "workdir").mkdir()
    return root


@pytest.fixture(scope="module")
def refmods():
    return ref_dataset_modules()


def _chdir(path):
    old = os.getcwd()
    os.chdir(path)
    return old


def _make_ref(refmods, tree, which: str, mode: str):
    d3, dlc = refmods
    old = _chdir(tree / "workdir")
    try:
        if which == "pretrain":
            return d3.UCF101_3d(mode=mode, transform=_ref_transform,
                                seq_len=SEQ_LEN, num_seq=NUM_SEQ,
                                downsample=DS, which_split=1)
        cls = dlc.UCF101_3d if which == "ucf101" else dlc.HMDB51_3d
        return cls(mode=mode, transform=_ref_transform, seq_len=SEQ_LEN,
                   num_seq=NUM_SEQ, downsample=DS, which_split=1)
    finally:
        os.chdir(old)


def _make_ours(tree, dataset: str, mode: str, **kw):
    return video_dataset.make_dataset(
        dataset, str(tree / "process_data" / "data"), mode,
        lambda frames, rng: np.asarray(frames, np.float32),
        num_seq=NUM_SEQ, seq_len=SEQ_LEN, downsample=DS, split=1,
        return_label=True, **kw)


def test_population_filter_matches_reference(refmods, tree):
    """Short videos (vlen <= span) are dropped from train AND test splits
    (``eval/dataset_3d_lc.py:61-67``); populations must match exactly."""
    for which, ours_name in [("pretrain", "ucf101"), ("ucf101", "ucf101"),
                             ("hmdb51", "hmdb51")]:
        for mode in ("train", "test"):
            if which == "pretrain" and mode == "test":
                continue  # pretrain dataset has no test mode
            ref = _make_ref(refmods, tree, which, mode)
            ours = _make_ours(tree, ours_name, mode)
            ref_paths = [os.path.normpath(p)
                         for p, _ in ref.video_info.itertuples(index=False)]
            our_paths = [os.path.normpath(r.path) for r in ours.records]
            assert our_paths == ref_paths, (which, mode)
            assert len(ours) == 3  # the span-length video dropped


def test_keep_short_flag_restores_padded_eval(tree):
    ours = _make_ours(tree, "ucf101", "test", keep_short_test=True)
    assert len(ours) == 4  # opt-in keeps the short video (PARITY.md #10)
    clip, _ = ours.sample(0, np.random.default_rng(0))
    # vlen=12, ds=2 -> 6 frames -> 3 blocks of 2 -> one padded window
    assert clip.shape[:3] == (1, NUM_SEQ, SEQ_LEN)


def test_train_lattice_matches_reference(refmods, tree, monkeypatch):
    """``idx_sampler``'s block lattice (``dpc/dataset_3d.py:88-95``) ==
    ``shapes.clip_block_indices`` for every legal start of every video."""
    ref = _make_ref(refmods, tree, "pretrain", "train")
    span = shapes.clip_span(NUM_SEQ, SEQ_LEN, DS)
    for _, (vpath, vlen) in ref.video_info.iterrows():
        for start in range(vlen - span):
            monkeypatch.setattr(
                np.random, "choice",
                lambda population, n, _s=start: np.array([_s]))
            block, _ = ref.idx_sampler(vlen, vpath)
            ours = shapes.clip_block_indices(start, NUM_SEQ, SEQ_LEN, DS)
            np.testing.assert_array_equal(np.asarray(block), ours)


def _ref_window_lattice(ref, index: int) -> np.ndarray:
    """Decode the frame-index lattice out of the reference ``__getitem__``
    test-mode output ``[NW, num_seq, C, seq_len, H, W]``."""
    t_seq, _ = ref[index]
    arr = np.asarray(t_seq)
    assert arr.ndim == 6
    lattice = arr[:, :, 0, :, 0, 0]  # every pixel == frame index
    assert (lattice == np.round(lattice)).all()
    return lattice.astype(np.int64)


@pytest.mark.parametrize("which", ["ucf101", "hmdb51"])
def test_test_window_indices_match_reference(refmods, tree, which):
    """Dense test-mode window index sets — including the no-tail-window
    semantics of ``eval/dataset_3d_lc.py:124`` — must match both
    ``shapes.test_time_windows`` and the full dataset output."""
    ref = _make_ref(refmods, tree, which, "test")
    ours = _make_ours(tree, which, "test")
    stride = (3 * NUM_SEQ // 4) if which == "hmdb51" else NUM_SEQ // 2
    assert ours.window_stride == max(1, stride)
    for i in range(len(ours)):
        want = _ref_window_lattice(ref, i)
        rec = ours.records[i]
        got = shapes.test_time_windows(rec.num_frames, NUM_SEQ, SEQ_LEN,
                                       DS, ours.window_stride)
        np.testing.assert_array_equal(got, want, err_msg=rec.path)
        clip, _ = ours.sample(i, np.random.default_rng(0))
        got_pixels = clip[:, :, :, 0, 0, 0].astype(np.int64)
        np.testing.assert_array_equal(got_pixels, want, err_msg=rec.path)


def test_five_crop_window_stride_matches_reference_branch(tree):
    """The reference's MULTI-crop dense-test branch strides num_seq//2
    for BOTH datasets (``eval/dataset_3d_lc.py:119,249``); only the
    plain HMDB branch strides 3*num_seq//4 (``:254``).  The window SET
    at a given stride is goldened above — this pins the stride CHOICE
    for the five-crop recipe (hmdb previously reused the plain-branch
    stride)."""
    for which in ("ucf101", "hmdb51"):
        ours = _make_ours(tree, which, "test", five_crop=True)
        assert ours.window_stride == max(1, NUM_SEQ // 2), which


def test_tail_window_flag_adds_exactly_the_tail(tree):
    """vlen=47/ds=2 -> 12 blocks; HMDB stride 2 covers starts 0..8, tail
    start 9 is only evaluated with the opt-in (PARITY.md #11)."""
    base = shapes.test_time_windows(47, NUM_SEQ, SEQ_LEN, DS, 2)
    tail = shapes.test_time_windows(47, NUM_SEQ, SEQ_LEN, DS, 2,
                                    tail_window=True)
    assert tail.shape[0] == base.shape[0] + 1
    np.testing.assert_array_equal(tail[:-1], base)
    # the tail window ends exactly at the last full block
    all_idx = np.arange(0, 47, DS)
    num_blocks = len(all_idx) // SEQ_LEN
    assert tail[-1, -1, -1] == all_idx[num_blocks * SEQ_LEN - 1]
    # vlen=30 -> 7 blocks; stride 2 lands on 7-3=4 exactly: no tail added
    same = shapes.test_time_windows(30, NUM_SEQ, SEQ_LEN, DS, 2,
                                    tail_window=True)
    np.testing.assert_array_equal(
        same, shapes.test_time_windows(30, NUM_SEQ, SEQ_LEN, DS, 2))
