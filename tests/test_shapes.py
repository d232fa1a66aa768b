"""Unit tests for the pure shape/index algebra (SURVEY §4 plan item (a))."""

import numpy as np

from dpc_tpu.core import shapes
from dpc_tpu.core.config import DPCConfig


def test_backbone_out_shape_matches_ceil_formulas():
    for img in (64, 128, 224, 256):
        for sl in (4, 5, 8, 16):
            t, s = shapes.backbone_out_shape(img, sl)
            assert t == shapes.last_duration(sl), (img, sl, t)
            assert s == shapes.last_size(img), (img, sl, s)


def test_canonical_config_shapes():
    cfg = DPCConfig()  # R18, 128², 8×5, pred 3
    assert cfg.last_size == 4
    assert cfg.last_duration == 2
    assert cfg.sq == 16
    assert cfg.feature_size == 256
    assert cfg.context_blocks == 5
    big = DPCConfig(img_dim=224, network="resnet34")
    assert big.last_size == 7
    assert big.feature_size == 256
    deep = DPCConfig(network="resnet50")
    assert deep.feature_size == 1024


def test_clip_block_indices_lattice():
    # out[n, s] = start + n*ds*sl + s*ds  (dpc/dataset_3d.py:92-94)
    idx = shapes.clip_block_indices(7, num_seq=8, seq_len=5, downsample=3)
    assert idx.shape == (8, 5)
    assert idx[0, 0] == 7
    assert idx[0, 1] == 10
    assert idx[1, 0] == 7 + 15
    assert idx[7, 4] == 7 + 7 * 15 + 4 * 3
    # strictly increasing when flattened: blocks are contiguous in stride
    flat = idx.reshape(-1)
    assert (np.diff(flat) == 3).all()


def test_sample_clip_start_bounds():
    rng = np.random.default_rng(0)
    span = shapes.clip_span(8, 5, 3)  # 120
    assert span == 120
    assert shapes.sample_clip_start(rng, 120, 8, 5, 3) is None  # too short
    starts = [shapes.sample_clip_start(rng, 200, 8, 5, 3) for _ in range(200)]
    assert all(0 <= s < 200 - 120 for s in starts)


def test_test_time_windows():
    w = shapes.test_time_windows(vlen=300, num_seq=8, seq_len=5,
                                 downsample=3, window_stride=4)
    # 100 sampled frames -> 20 blocks -> windows at 0,4,8,12
    assert w.shape == (4, 8, 5)
    assert (w < 300).all() and (w >= 0).all()
    # half-overlap: consecutive windows share num_seq - stride blocks
    assert (w[0, 4:] == w[1, :4]).all()
    # short video: single padded window
    w2 = shapes.test_time_windows(vlen=40, num_seq=8, seq_len=5,
                                  downsample=3, window_stride=4)
    assert w2.shape == (1, 8, 5)
