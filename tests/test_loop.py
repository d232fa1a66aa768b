"""Shared epoch-loop runtime semantics (train/loop.py): non-finite policy
per mode and the preemption save/exit path in train AND val epochs."""

import numpy as np
import pytest

from dpc_tpu.train import loop
from dpc_tpu.train.metrics import MetricBundle


def _loader(n, rows=4):
    return [np.zeros((rows, 2), np.float32)] * n


def _dispatch(losses):
    def dispatch(idx, batch):
        return {"loss": losses[idx]}
    return dispatch


def test_train_nonfinite_raises():
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        loop.run_epoch(_dispatch([1.0, float("nan"), 1.0]), _loader(3),
                       MetricBundle(), train=True)


def test_val_nonfinite_warns_and_continues(capsys):
    """A stray non-finite VAL batch must not kill a finished train epoch
    before its checkpoint lands (the reference's validate just averages,
    eval/test.py:278-301)."""
    meters = MetricBundle()
    steps = loop.run_epoch(_dispatch([1.0, float("nan"), 2.0]), _loader(3),
                           meters, mode="val", train=False)
    assert steps == 3
    assert "WARNING: non-finite loss" in capsys.readouterr().out


class _Guard:
    def __init__(self, requested=False):
        self.requested = requested


def test_val_preemption_saves_and_exits():
    """Preemption during a VAL epoch checkpoints via the caller's
    step_save_fn (end-of-train-epoch position) and exits — before this,
    the flag was only checked in the train loop and a whole val epoch
    ran inside the TPU-VM grace window."""
    saved = []
    with pytest.raises(SystemExit, match="preemption"):
        loop.run_epoch(_dispatch([1.0] * 4), _loader(4), MetricBundle(),
                       mode="val", train=False, epoch=3,
                       guard=_Guard(requested=True),
                       step_save_fn=lambda ep, idx, block: saved.append((ep, block)))
    assert saved == [(3, True)]  # preemption saves block


def test_val_never_saves_periodically():
    """save_every_steps is a TRAIN cadence; an unpreempted val epoch must
    not re-write the same state every N batches."""
    saved = []
    loop.run_epoch(_dispatch([1.0] * 4), _loader(4), MetricBundle(),
                   mode="val", train=False, guard=_Guard(),
                   step_save_fn=lambda ep, idx, block: saved.append(idx),
                   save_every_steps=1)
    assert saved == []


def test_train_preemption_still_saves():
    saved = []
    with pytest.raises(SystemExit, match="preemption"):
        loop.run_epoch(_dispatch([1.0] * 4), _loader(4), MetricBundle(),
                       train=True, guard=_Guard(requested=True),
                       step_save_fn=lambda ep, idx, block: saved.append((idx, block)))
    assert saved == [(0, True)]  # preemption saves block


def test_train_periodic_save_is_async():
    """Periodic mid-epoch saves hand off to Orbax's async writer
    (block=False) so the loop never stalls for the write; only
    preemption saves block."""
    saved = []
    loop.run_epoch(_dispatch([1.0] * 4), _loader(4), MetricBundle(),
                   train=True, guard=_Guard(),
                   step_save_fn=lambda ep, idx, block: saved.append(
                       (idx, block)),
                   save_every_steps=2)
    assert saved == [(1, False), (3, False)]
