"""bench_input iterator-cycling edge cases: a loader epoch that yields
one batch (pool re-warm eats it) and a zero-batch loader must exit with
a clear message instead of an uncaught StopIteration; a 2-batch epoch
still reaches steady state and prints the JSON line."""

import json

import pytest

from dpc_tpu.data import synthetic as synthetic_mod
from dpc_tpu.train import bench_input

ARGS = ["--dataset", "synthetic", "--num_workers", "2", "--batches", "4"]


@pytest.fixture
def tiny_tree(monkeypatch):
    """Cap the synthetic tree so batches/epoch is controlled by the
    test's --batch_size (bench_input sizes num_videos to avoid cycling
    by default — these tests exist to force it)."""
    real = synthetic_mod.SyntheticVideoDataset

    def capped(n):
        def make(transform, num_videos, video_len, frame_size):
            return real(transform=transform, num_videos=n,
                        video_len=160, frame_size=150)
        return make

    def install(n):
        monkeypatch.setattr(synthetic_mod, "SyntheticVideoDataset",
                            capped(n))

    return install


def test_two_batches_per_epoch_cycles_and_reports(tiny_tree, capsys):
    tiny_tree(8)  # batch_size 4 -> 2 batches/epoch; warm-up + cycling
    bench_input.main(ARGS + ["--batch_size", "4"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "input clips/sec (host)"
    assert out["value"] > 0


def test_one_batch_per_epoch_exits_clean(tiny_tree):
    # every epoch's single batch is consumed as a pool re-warm, so no
    # steady-state fetch ever lands: must SystemExit, not StopIteration
    tiny_tree(4)
    with pytest.raises(SystemExit, match="no steady-state batches"):
        bench_input.main(ARGS + ["--batch_size", "4"])


def test_zero_batch_loader_exits_clean(tiny_tree):
    # batch_size larger than the tree with drop_last: zero batches
    tiny_tree(2)
    with pytest.raises(SystemExit, match="zero batches"):
        bench_input.main(ARGS + ["--batch_size", "4"])
