"""Data pipeline tests: augmentations, synthetic dataset, loader,
offline preprocessing roundtrip, frame datasets."""

import os

import numpy as np
import pytest

from dpc_tpu.data import augment as A
from dpc_tpu.data.loader import ClipLoader
from dpc_tpu.data.synthetic import SyntheticVideoDataset
from dpc_tpu.core import shapes
from dpc_tpu.data import preprocess, video_dataset


def _clip(t=4, h=64, w=80, seed=0):
    return np.random.default_rng(seed).integers(
        0, 255, size=(t, h, w, 3), dtype=np.uint8)


class TestAugment:
    def test_scale_short_side(self):
        out = A.Scale(32)(_clip(), np.random.default_rng(0))
        assert out.shape == (4, 32, 40, 3)  # short side 64 → 32, aspect kept

    def test_scale_fixed(self):
        out = A.Scale((48, 24))(_clip(), np.random.default_rng(0))
        assert out.shape == (4, 24, 48, 3)  # (w, h) convention like PIL

    def test_center_crop(self):
        out = A.CenterCrop(32)(_clip(), np.random.default_rng(0))
        ref = _clip()[:, 16:48, 24:56]
        np.testing.assert_array_equal(out, ref)

    def test_random_crop_consistent(self):
        rng = np.random.default_rng(1)
        out = A.RandomCrop(32, consistent=True)(_clip(), rng)
        assert out.shape == (4, 32, 32, 3)
        # consistency: every frame is the same window of the source
        src = _clip()
        found = False
        for y in range(33):
            for x in range(49):
                if np.array_equal(out[0], src[0, y:y + 32, x:x + 32]):
                    np.testing.assert_array_equal(
                        out, src[:, y:y + 32, x:x + 32])
                    found = True
        assert found

    def test_random_sized_crop_shapes(self):
        rng = np.random.default_rng(2)
        out = A.RandomSizedCrop(32)(_clip(), rng)
        assert out.shape == (4, 32, 32, 3)
        # p=0 → deterministic center crop
        out0 = A.RandomSizedCrop(32, p=0.0)(_clip(), rng)
        np.testing.assert_array_equal(
            out0, A.CenterCrop(32)(_clip(), rng))

    def test_horizontal_flip_forced(self):
        src = _clip()
        left = A.RandomHorizontalFlip(command="left")(
            src, np.random.default_rng(0))
        right = A.RandomHorizontalFlip(command="right")(
            src, np.random.default_rng(0))
        np.testing.assert_array_equal(left, src)
        np.testing.assert_array_equal(right, src[:, :, ::-1])

    def test_random_rotation_consistent_expands(self):
        out = A.RandomRotation(consistent=True, degree=15, p=1.0)(
            _clip(), np.random.default_rng(3))
        # expand=True: the canvas grows unless deg == 0; one shared shape
        assert out.ndim == 4 and out.shape[0] == 4
        assert out.shape[1] >= 64 and out.shape[2] >= 80

    def test_random_rotation_inconsistent_uniform_canvas(self):
        # per-frame degrees expand to different sizes; frames are centred
        # on the common max canvas (PARITY.md #16 — the reference returns
        # a ragged PIL list here; np.stack used to crash)
        out = A.RandomRotation(consistent=False, degree=15, p=1.0)(
            _clip(), np.random.default_rng(4))
        assert out.ndim == 4 and out.shape[0] == 4
        assert out.shape[1] >= 64 and out.shape[2] >= 80

    def test_random_gray_is_channel_split(self):
        out = A.RandomGray(consistent=True, p=1.0)(
            _clip(), np.random.default_rng(3))
        assert (out[..., 0] == out[..., 1]).all()
        assert (out[..., 1] == out[..., 2]).all()
        src = _clip()
        assert any((out[..., 0] == src[..., ch]).all() for ch in range(3))

    def test_color_jitter_factors(self):
        img = _clip()[0]
        np.testing.assert_array_equal(A.adjust_brightness(img, 1.0), img)
        assert A.adjust_brightness(img, 0.0).max() == 0
        np.testing.assert_array_equal(A.adjust_contrast(img, 1.0), img)
        np.testing.assert_array_equal(A.adjust_saturation(img, 1.0), img)
        g = A.adjust_saturation(img, 0.0)
        assert (g[..., 0] == g[..., 1]).all()
        # hue shift by a full wheel is identity-ish (wraps mod 256 ≈ 255/255)
        h0 = A.adjust_hue(img, 0.0)
        np.testing.assert_array_equal(h0, img)

    def test_color_jitter_blend_formulas(self):
        # torchvision semantics: blend(img, degenerate, factor)
        # (torchvision isn't installed here; check the closed forms)
        img = _clip()[0]
        for f in (0.5, 0.8, 1.3):
            want = np.clip(img.astype(np.float32) * f, 0, 255).astype(
                np.uint8)
            np.testing.assert_array_equal(A.adjust_brightness(img, f), want)
            gray = (img[..., 0] * 0.299 + img[..., 1] * 0.587
                    + img[..., 2] * 0.114).astype(np.uint8)[..., None]
            want = np.clip(img.astype(np.float32) * f
                           + gray.astype(np.float32) * (1 - f),
                           0, 255).astype(np.uint8)
            np.testing.assert_array_equal(A.adjust_saturation(img, f), want)
            mean = int(gray[..., 0].mean() + 0.5)
            want = np.clip(img.astype(np.float32) * f + mean * (1 - f),
                           0, 255).astype(np.uint8)
            # f32 vs f64 truncation boundaries → tolerate off-by-one
            assert np.abs(A.adjust_contrast(img, f).astype(int)
                          - want.astype(int)).max() <= 1

    def test_normalize_range(self):
        out = A.Normalize()(_clip(), None)
        assert out.dtype == np.float32
        assert -3.0 < out.min() and out.max() < 3.0

    def test_pretrain_recipe_end_to_end(self):
        clip = _clip(t=40, h=256, w=320)
        out = A.pretrain_transform("ucf101", 128)(
            clip, np.random.default_rng(0))
        assert out.shape == (40, 128, 128, 3)
        assert out.dtype == np.float32
        out = A.pretrain_transform("k400", 128)(
            _clip(t=40, h=150, w=200), np.random.default_rng(0))
        assert out.shape == (40, 128, 128, 3)

    def test_determinism_same_seed(self):
        tf = A.pretrain_transform("ucf101", 64)
        clip = _clip(t=8, h=256, w=320)
        a = tf(clip, np.random.default_rng(7))
        b = tf(clip, np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)


class TestSynthetic:
    def test_shapes_and_determinism(self):
        ds = SyntheticVideoDataset(num_videos=4, frame_size=64,
                                   num_seq=3, seq_len=4, downsample=2,
                                   video_len=64)
        a = ds.sample(0, np.random.default_rng(0))
        b = ds.sample(0, np.random.default_rng(0))
        assert a.shape == (3, 4, 64, 64, 3)
        np.testing.assert_array_equal(a, b)

    def test_labels_and_test_mode(self):
        ds = SyntheticVideoDataset(num_videos=6, frame_size=32,
                                   num_seq=2, seq_len=3, downsample=2,
                                   video_len=64, mode="test",
                                   return_label=True, num_classes=3)
        clip, label = ds.sample(4, np.random.default_rng(0))
        assert clip.ndim == 6 and clip.shape[1:3] == (2, 3)
        assert label == 1

    def test_temporal_structure(self):
        # consecutive frames must differ (motion) but not be noise
        ds = SyntheticVideoDataset(num_videos=1, frame_size=64,
                                   num_seq=2, seq_len=4, downsample=1,
                                   video_len=64)
        f = ds._render_frames(0, np.arange(4))
        d01 = np.abs(f[0].astype(int) - f[1].astype(int)).mean()
        assert 0 < d01 < 30


class TestLoader:
    def _ds(self, n=10, label=False):
        return SyntheticVideoDataset(num_videos=n, frame_size=32,
                                     num_seq=2, seq_len=3, downsample=2,
                                     video_len=64, return_label=label)

    def test_batch_shapes_drop_last(self):
        loader = ClipLoader(self._ds(10), batch_size=4, num_workers=2,
                            seed=1)
        batches = list(loader)
        assert len(batches) == 2  # drop_last
        assert batches[0].shape == (4, 2, 3, 32, 32, 3)

    def test_labels(self):
        loader = ClipLoader(self._ds(8, label=True), batch_size=4,
                            num_workers=2, seed=1)
        clips, labels = next(iter(loader))
        assert clips.shape[0] == 4 and labels.shape == (4,)
        assert labels.dtype == np.int32

    def test_epoch_reshuffles_and_seeds(self):
        loader = ClipLoader(self._ds(8), batch_size=4, num_workers=2,
                            seed=5)
        a = next(iter(loader))
        b = next(iter(loader))
        np.testing.assert_array_equal(a, b)  # same epoch → same data
        loader.set_epoch(1)
        c = next(iter(loader))
        assert not np.array_equal(a, c)

    def test_prefetch_zero_stays_bounded(self):
        # Queue(maxsize=0) means UNBOUNDED in the stdlib: --prefetch 0
        # must floor to 1, not decode the whole epoch into host RAM
        import time

        ds = self._ds(32)
        calls = []
        orig = ds.sample

        def counting_sample(i, rng):
            calls.append(i)
            return orig(i, rng)

        ds.sample = counting_sample
        loader = ClipLoader(ds, batch_size=2, num_workers=2, seed=1,
                            prefetch_batches=0)
        it = iter(loader)
        batch = next(it)
        assert batch.shape[0] == 2
        time.sleep(0.5)  # give an unbounded producer time to run away
        # consumed 1 batch + queue(1) + up to 2 in-flight workers + the
        # assembling batch: far below the 32 samples an unbounded queue
        # would have decoded by now
        assert len(calls) <= 12, len(calls)

    def test_worker_error_propagates(self):
        class Bad:
            def __len__(self):
                return 4

            def sample(self, i, rng):
                raise RuntimeError("boom")

        with pytest.raises(RuntimeError, match="boom"):
            list(ClipLoader(Bad(), batch_size=2, num_workers=2))


class TestPreprocess(object):
    def test_video_roundtrip(self, tmp_path):
        import cv2

        # write a tiny avi, extract frames, build CSV, read via dataset
        vid_dir = tmp_path / "videos" / "classA"
        vid_dir.mkdir(parents=True)
        path = str(vid_dir / "v_test.avi")
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                             (80, 64))
        rng = np.random.default_rng(0)
        for i in range(12):
            wr.write(rng.integers(0, 255, (64, 80, 3), np.uint8))
        wr.release()

        out_root = str(tmp_path / "frames")
        preprocess.extract_tree(str(tmp_path / "videos"), out_root,
                                short_side=32, num_workers=1,
                                use_processes=False)
        frame_dir = os.path.join(out_root, "classA", "v_test")
        n = preprocess.count_frames(frame_dir)
        assert n == 12
        img = video_dataset.load_frame(
            os.path.join(frame_dir, "image_00001.jpg"))
        assert img.shape == (32, 40, 3)  # short side 64 → 32

        csv_path = str(tmp_path / "split.csv")
        preprocess.write_split_csv([frame_dir], csv_path, num_workers=1)
        rows = video_dataset.read_split_csv(csv_path)
        assert rows == [(frame_dir, 12)]

        # resumability: second run skips via .done marker
        assert preprocess.extract_video(path, frame_dir, 32) == 12

    def test_class_index_roundtrip(self, tmp_path):
        p = str(tmp_path / "classInd.txt")
        preprocess.write_class_index(["Basketball", "ApplyLipstick"], p)
        enc = video_dataset.read_class_index(p)
        assert enc == {"ApplyLipstick": 0, "Basketball": 1}

    def test_hmdb_split_lists(self, tmp_path):
        # official per-class <action>_test_split<N>.txt: 1=train, 2=test,
        # 0=unused (reference write_csv.py:34-53)
        sd = tmp_path / "splits"
        sd.mkdir()
        (sd / "brush_hair_test_split1.txt").write_text(
            "a.avi 1 \nb.avi 2 \nc.avi 0 \n")
        (sd / "wave_test_split1.txt").write_text("d.avi 1 \n")
        (sd / "wave_test_split2.txt").write_text("e.avi 1 \n")  # other split
        train, test = preprocess.hmdb_split_to_dirs(str(sd), "/fr", 1)
        assert train == ["/fr/brush_hair/a", "/fr/wave/d"]
        assert test == ["/fr/brush_hair/b"]


class TestFrameDataset:
    def _make_tree(self, tmp_path, n_videos=3, n_frames=30):
        root = tmp_path / "frames"
        rows = []
        import cv2

        for v in range(n_videos):
            d = root / "classA" / f"v_{v:03d}"
            d.mkdir(parents=True)
            rng = np.random.default_rng(v)
            for i in range(n_frames):
                cv2.imwrite(str(d / f"image_{i + 1:05d}.jpg"),
                            rng.integers(0, 255, (64, 80, 3), np.uint8))
            rows.append((str(d), n_frames))
        csv_path = str(tmp_path / "train_split01.csv")
        with open(csv_path, "w") as f:
            for r in rows:
                f.write(f"{r[0]},{r[1]}\n")
        return rows, csv_path

    def test_sample_and_filter(self, tmp_path):
        rows, _ = self._make_tree(tmp_path)
        recs = [video_dataset.VideoRecord(p, n) for p, n in rows]
        recs.append(video_dataset.VideoRecord("short", 5))  # filtered out
        tf = A.Compose([A.Normalize()])
        ds = video_dataset.FrameClipDataset(recs, tf, num_seq=2, seq_len=3,
                                            downsample=2)
        assert len(ds) == len(rows)
        clip = ds.sample(0, np.random.default_rng(0))
        assert clip.shape == (2, 3, 64, 80, 3)

    def test_test_mode_windows(self, tmp_path):
        rows, _ = self._make_tree(tmp_path, n_videos=1, n_frames=30)
        recs = [video_dataset.VideoRecord(p, n, label=0) for p, n in rows]
        tf = A.Compose([A.Normalize()])
        ds = video_dataset.FrameClipDataset(
            recs, tf, num_seq=2, seq_len=3, downsample=2, mode="test",
            return_label=True)
        clip, label = ds.sample(0, np.random.default_rng(0))
        # 15 sampled frames → 5 blocks → windows of 2, stride 1
        assert clip.shape[1:] == (2, 3, 64, 80, 3)
        assert clip.shape[0] == 4
        assert label == 0


class TestLoaderSharding:
    def _ds(self, n=16):
        return SyntheticVideoDataset(num_videos=n, frame_size=32,
                                     num_seq=2, seq_len=3, downsample=2,
                                     video_len=64, return_label=True)

    def test_shards_partition_the_epoch(self):
        ds = self._ds(16)
        seen = []
        for shard in range(4):
            loader = ClipLoader(ds, batch_size=2, num_workers=1, seed=3,
                                shard_id=shard, num_shards=4)
            assert len(loader) == 2
            for clips, labels in loader:
                seen.extend(labels.tolist())
        # 4 shards × 4 samples = all 16 videos exactly once
        assert len(seen) == 16

    def test_shard_determinism(self):
        ds = self._ds(8)
        a = [l.tolist() for _, l in ClipLoader(ds, 2, num_workers=1,
                                               seed=1, shard_id=1,
                                               num_shards=2)]
        b = [l.tolist() for _, l in ClipLoader(ds, 2, num_workers=1,
                                               seed=1, shard_id=1,
                                               num_shards=2)]
        assert a == b


class TestFiveCropAndFlow:
    def test_five_crop_shapes_and_contents(self):
        clip = _clip(t=3, h=64, w=80)
        out = A.FiveCrop(32)(clip)
        assert out.shape == (5, 3, 32, 32, 3)
        np.testing.assert_array_equal(out[0], clip[:, :32, :32])      # TL
        np.testing.assert_array_equal(out[3], clip[:, -32:, -32:])    # BR
        np.testing.assert_array_equal(out[4], clip[:, 16:48, 24:56])  # C

    def test_flow_guided_crop_prefers_high_flow(self):
        clip = _clip(t=2, h=64, w=64)
        flow = np.zeros((2, 64, 64, 2), np.float32)
        flow[:, 40:, 40:] = 10.0  # motion in bottom-right
        op = A.RandomCrop(16, consistent=False, num_proposals=8)
        rng = np.random.default_rng(0)
        out = op(clip, rng, flowmap=flow)
        assert out.shape == (2, 16, 16, 3)

    def test_five_crop_windows_fold(self, tmp_path):
        import cv2
        d = tmp_path / "classA" / "v_0"
        d.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(30):
            cv2.imwrite(str(d / f"image_{i + 1:05d}.jpg"),
                        rng.integers(0, 255, (64, 80, 3), np.uint8))
        recs = [video_dataset.VideoRecord(str(d), 30, label=2)]
        tf = A.Compose([A.FiveCrop(32), A.Normalize()])
        ds = video_dataset.FrameClipDataset(
            recs, tf, num_seq=2, seq_len=3, downsample=2, mode="test",
            return_label=True)
        clip, label = ds.sample(0, np.random.default_rng(0))
        # 4 windows × 5 crops = 20
        assert clip.shape == (20, 2, 3, 32, 32, 3)
        assert label == 2


class TestDenseTestDecodeOnce:
    """Dense test mode decodes + transforms each unique frame ONCE and
    windows by gathering — same result, ~half the host decode work at
    UCF's N/2 window stride (eval/dataset_3d_lc.py:95,109-125)."""

    def _tree(self, tmp_path, n_frames=30):
        import cv2
        d = tmp_path / "classA" / "v_0"
        d.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(n_frames):
            cv2.imwrite(str(d / f"image_{i + 1:05d}.jpg"),
                        rng.integers(0, 255, (64, 80, 3), np.uint8))
        return [video_dataset.VideoRecord(str(d), n_frames, label=1)]

    def test_unique_frames_decoded_once_bit_exact(self, tmp_path,
                                                  monkeypatch):
        recs = self._tree(tmp_path)
        tf = A.Compose([A.Normalize()])
        ds = video_dataset.FrameClipDataset(
            recs, tf, num_seq=2, seq_len=3, downsample=2, mode="test",
            return_label=True)
        loaded_counts = []
        orig = video_dataset.FrameClipDataset._load_frames

        def spy(self, record, indices):
            loaded_counts.append(np.asarray(indices).size)
            return orig(self, record, indices)

        monkeypatch.setattr(video_dataset.FrameClipDataset,
                            "_load_frames", spy)
        clip, label = ds.sample(0, np.random.default_rng(0))
        windows = shapes.test_time_windows(30, 2, 3, 2, ds.window_stride)
        flat = np.minimum(windows.reshape(-1), 29)
        n_uniq = len(np.unique(flat))
        assert n_uniq < flat.size  # windows genuinely overlap here
        assert loaded_counts == [n_uniq]
        # bit-exact vs decoding every window occurrence
        frames = np.stack([video_dataset.load_frame(
            ds._frame_path(recs[0], int(i))) for i in flat])
        want = tf(frames, np.random.default_rng(0)).reshape(clip.shape)
        np.testing.assert_array_equal(clip, want)

    def test_per_frame_random_transform_falls_back(self, tmp_path,
                                                   monkeypatch):
        # a per-frame-random transform would change results under dedupe;
        # sample() must detect it and decode per occurrence
        recs = self._tree(tmp_path)
        tf = A.Compose([A.RandomGray(consistent=False, p=1.0),
                        A.Normalize()])
        assert not A.frame_consistent(tf)
        ds = video_dataset.FrameClipDataset(
            recs, tf, num_seq=2, seq_len=3, downsample=2, mode="test")
        loaded_counts = []
        orig = video_dataset.FrameClipDataset._load_frames

        def spy(self, record, indices):
            loaded_counts.append(np.asarray(indices).size)
            return orig(self, record, indices)

        monkeypatch.setattr(video_dataset.FrameClipDataset,
                            "_load_frames", spy)
        clip = ds.sample(0, np.random.default_rng(0))
        assert clip.shape == (4, 2, 3, 64, 80, 3)
        assert loaded_counts == [24]  # 4 windows × 6 frame slots

    def test_frame_consistent_classifier(self):
        assert A.frame_consistent(A.Compose([A.Normalize()]))
        assert A.frame_consistent(A.finetune_transform(64, "test"))
        assert A.frame_consistent(
            A.finetune_transform(64, "test", five_crop=True))
        assert A.frame_consistent(A.HostScaleCrop(240, (224, 224),
                                                  center=True))
        assert not A.frame_consistent(A.pretrain_transform("ucf101", 64))
        # wrappers recurse: a per-frame-random op can't hide inside
        # PerCrop or a nested Compose
        assert not A.frame_consistent(A.Compose([
            A.FiveCrop(64),
            A.PerCrop(A.ColorJitter(0.5, 0.5, 0.5, 0.2, consistent=False)),
            A.Normalize()]))
        assert not A.frame_consistent(A.Compose([
            A.Compose([A.RandomGray(consistent=False, p=1.0)]),
            A.Normalize()]))
        assert A.frame_consistent(A.Compose([
            A.FiveCrop(64), A.PerCrop(A.Scale(64)), A.Normalize()]))
        # closed-world: an unknown op disables the dedupe instead of
        # defaulting to frame-consistent
        assert not A.frame_consistent(A.Compose([lambda c, rng: c]))


class TestBatchedNativeDecode:
    """The hot path must use ONE native batch-decode call per clip and
    produce exactly what the per-frame path produces."""

    def _tree(self, tmp_path, n_frames=30):
        import cv2
        d = tmp_path / "classA" / "v_0"
        d.mkdir(parents=True)
        rng = np.random.default_rng(7)
        for i in range(n_frames):
            cv2.imwrite(str(d / f"image_{i + 1:05d}.jpg"),
                        rng.integers(0, 255, (64, 80, 3), np.uint8))
        return [video_dataset.VideoRecord(str(d), n_frames)]

    def test_batch_path_matches_per_frame(self, tmp_path):
        from dpc_tpu import native
        if not native.available():
            pytest.skip("native decoder unavailable")
        recs = self._tree(tmp_path)
        for decode_size in [(32, 40), None]:
            ds = video_dataset.FrameClipDataset(
                recs, A.Compose([]), num_seq=2, seq_len=3, downsample=2,
                decode_size=decode_size)
            idx = np.arange(6).reshape(2, 3)
            batched = ds._load_frames(recs[0], idx)
            per_frame = np.stack([
                video_dataset.load_frame(ds._frame_path(recs[0], i),
                                         decode_size)
                for i in range(6)])
            np.testing.assert_array_equal(batched, per_frame)

    def test_batch_path_is_taken(self, tmp_path, monkeypatch):
        from dpc_tpu import native
        if not native.available():
            pytest.skip("native decoder unavailable")
        recs = self._tree(tmp_path)
        ds = video_dataset.FrameClipDataset(
            recs, A.Compose([]), num_seq=2, seq_len=3, downsample=2,
            decode_size=(32, 40))
        monkeypatch.setattr(video_dataset, "load_frame",
                            lambda *a, **k: pytest.fail(
                                "per-frame fallback used"))
        out = ds._load_frames(recs[0], np.arange(6).reshape(2, 3))
        assert out.shape == (6, 32, 40, 3)

    def test_corrupt_frame_falls_back(self, tmp_path):
        from dpc_tpu import native
        if not native.available():
            pytest.skip("native decoder unavailable")
        recs = self._tree(tmp_path)
        # frame 3 corrupt: batch decode reports a failure -> fallback path
        with open(os.path.join(recs[0].path, "image_00003.jpg"), "wb") as f:
            f.write(b"not a jpeg")
        ds = video_dataset.FrameClipDataset(
            recs, A.Compose([]), num_seq=2, seq_len=3, downsample=2,
            decode_size=(32, 40))
        assert ds._load_frames_native_batch(
            [ds._frame_path(recs[0], i) for i in range(6)]) is None


class TestProcessLoader:
    def test_process_mode_matches_thread_mode(self):
        ds = SyntheticVideoDataset(num_videos=8, frame_size=32, num_seq=2,
                                   seq_len=3, downsample=2, video_len=64,
                                   return_label=True)
        thread = ClipLoader(ds, batch_size=4, num_workers=2, seed=5)
        proc = ClipLoader(ds, batch_size=4, num_workers=2, seed=5,
                          worker_mode="process")
        try:
            for (tc, tl), (pc, pl) in zip(thread, proc):
                np.testing.assert_array_equal(tc, pc)
                np.testing.assert_array_equal(tl, pl)
            # pool persists across epochs; determinism travels with tasks
            thread.set_epoch(1)
            proc.set_epoch(1)
            for (tc, tl), (pc, pl) in zip(thread, proc):
                np.testing.assert_array_equal(tc, pc)
        finally:
            proc.close()

    @pytest.mark.slow
    @pytest.mark.skipif((os.cpu_count() or 1) < 4,
                        reason="pool scaling needs >=4 idle cores "
                               "(this assumption is recorded as unverified "
                               "in docs/RESULTS.md provisioning tables)")
    @pytest.mark.skipif(os.getloadavg()[0] > max((os.cpu_count() or 1) - 3,
                                                 1.0),
                        reason="host is busy: a wall-clock 2x-scaling "
                               "assert under core contention measures the "
                               "contention, not the pool")
    def test_process_pool_scales_full_augment_chain(self):
        """--worker_mode process must parallelise the GIL-holding host
        augment chain: >=1.7x from 1 -> 2 workers (VERDICT r4 #6; 2.0x
        is ideal).  The provisioning cores/chip tables in docs/RESULTS.md
        assume this scaling is ~linear."""
        import time

        from dpc_tpu.data.augment import pretrain_transform
        ds = SyntheticVideoDataset(
            transform=pretrain_transform("ucf101", 128),
            num_videos=80, frame_size=240, num_seq=4, seq_len=5,
            downsample=3, video_len=96)

        def batches_per_s(workers: int) -> float:
            loader = ClipLoader(ds, batch_size=8, num_workers=workers,
                                seed=0, shuffle=False, prefetch_batches=1,
                                worker_mode="process")
            try:
                it = iter(loader)
                next(it)  # spawn + warm the pool outside the timed region
                t0 = time.perf_counter()
                n = sum(1 for _ in it)
                return n / (time.perf_counter() - t0)
            finally:
                loader.close()

        r1, r2 = batches_per_s(1), batches_per_s(2)
        assert r2 / r1 >= 1.7, (r1, r2)


class TestPlannedRoiDecode:
    """--device_augment host path: the plan-capable HostScaleCrop executes
    inside the native ROI decode; sample() must produce exactly the window
    the numpy fallback path slices (round-3 VERDICT #4)."""

    def _tree(self, tmp_path, h=240, w=320, n_frames=40):
        import cv2
        d = tmp_path / "classA" / "v_roi"
        d.mkdir(parents=True)
        rng = np.random.default_rng(11)
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        for i in range(n_frames):
            img = np.roll(img, 3, axis=1)  # cheap motion
            cv2.imwrite(str(d / f"image_{i + 1:05d}.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 90])
        return [video_dataset.VideoRecord(str(d), n_frames)]

    def test_planned_matches_fallback_window(self, tmp_path):
        from dpc_tpu import native
        if not native.available():
            pytest.skip("native decoder unavailable")
        recs = self._tree(tmp_path)
        op = A.HostScaleCrop(240, (224, 224))
        ds = video_dataset.FrameClipDataset(
            recs, op, num_seq=2, seq_len=3, downsample=2)
        clip = ds.sample(0, np.random.default_rng(3))
        assert clip.shape == (2, 3, 224, 224, 3)
        assert clip.dtype == np.uint8

        # identical rng => identical planned window; the fallback decodes
        # fully then slices, which on a 240-short tree is bit-exact
        rng = np.random.default_rng(3)
        start = shapes.sample_clip_start(rng, 40, 2, 3, 2)
        idx = shapes.clip_block_indices(start, 2, 3, 2)
        frames = np.stack([video_dataset.load_frame(
            ds._frame_path(recs[0], int(i))) for i in idx.reshape(-1)])
        want = op(frames, rng).reshape(2, 3, 224, 224, 3)
        np.testing.assert_array_equal(clip, want)

    def test_planned_falls_back_when_pad_needed(self, tmp_path):
        from dpc_tpu import native
        if not native.available():
            pytest.skip("native decoder unavailable")
        recs = self._tree(tmp_path, h=320, w=200)  # portrait
        op = A.HostScaleCrop(150, (150, 200))  # k400 geometry
        ds = video_dataset.FrameClipDataset(
            recs, op, num_seq=2, seq_len=3, downsample=2)
        clip = ds.sample(0, np.random.default_rng(3))
        assert clip.shape == (2, 3, 150, 200, 3)

    def test_planned_test_mode_center_window(self, tmp_path):
        # dense-test --device_augment: the deterministic center plan
        # executes inside the ROI decode for EVERY window of the video,
        # bit-exact vs full-decode + CenterCrop on a 240-short tree
        from dpc_tpu import native
        if not native.available():
            pytest.skip("native decoder unavailable")
        recs = self._tree(tmp_path)
        op = A.HostScaleCrop(240, (224, 224), center=True)
        ds = video_dataset.FrameClipDataset(
            recs, op, num_seq=2, seq_len=3, downsample=2, mode="test")
        clip = ds.sample(0, np.random.default_rng(3))
        assert clip.dtype == np.uint8
        assert clip.shape[1:] == (2, 3, 224, 224, 3)

        windows = shapes.test_time_windows(40, 2, 3, 2,
                                           ds.window_stride)
        frames = np.stack([video_dataset.load_frame(
            ds._frame_path(recs[0], int(i)))
            for i in np.minimum(windows.reshape(-1), 39)])
        want = op(frames, np.random.default_rng(3)).reshape(clip.shape)
        np.testing.assert_array_equal(clip, want)
