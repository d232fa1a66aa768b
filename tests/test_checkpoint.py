"""Checkpoint save / resume / retention / transfer tests."""

import numpy as np

import jax
import jax.numpy as jnp

from dpc_tpu.core import checkpoint as ckpt


def _payload(seed):
    k = jax.random.PRNGKey(seed)
    return {
        "params": {"w": jax.random.normal(k, (4, 4)),
                   "b": jnp.zeros((4,))},
        "step": jnp.asarray(seed, jnp.int32),
    }


def test_save_restore_roundtrip(tmp_path):
    mgr = ckpt.make_manager(str(tmp_path / "run"))
    p = _payload(3)
    ckpt.save(mgr, epoch=1, payload=p, metrics={"val_acc": 0.5})
    epoch, restored = ckpt.restore_latest(
        mgr, jax.tree.map(jnp.zeros_like, p))
    assert epoch == 1
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(p["params"]["w"]))
    assert int(restored["step"]) == 3


def test_rolling_retention_keeps_best(tmp_path):
    mgr = ckpt.make_manager(str(tmp_path / "run"), max_to_keep=1)
    for epoch, acc in ((1, 0.2), (2, 0.9), (3, 0.4), (4, 0.5)):
        ckpt.save(mgr, epoch, _payload(epoch), metrics={"val_acc": acc})
    steps = set(mgr.all_steps())
    assert 2 in steps, f"best epoch evicted: {steps}"     # best kept
    assert 4 in steps, f"latest evicted: {steps}"          # latest kept
    epoch, best = ckpt.restore_best(mgr, _payload(0))
    assert epoch == 2 and int(best["step"]) == 2


def test_restore_empty_dir(tmp_path):
    mgr = ckpt.make_manager(str(tmp_path / "fresh"))
    epoch, payload = ckpt.restore_latest(mgr, _payload(0))
    assert epoch is None and int(payload["step"]) == 0


def test_transfer_load_intersection():
    src = {"backbone": {"w": jnp.ones((2, 2))},
           "pred": {"w": jnp.full((3,), 7.0)}}
    tgt = {"backbone": {"w": jnp.zeros((2, 2))},
           "head": {"w": jnp.zeros((5,))}}
    out = ckpt.transfer_load(tgt, src, verbose=False)
    np.testing.assert_array_equal(np.asarray(out["backbone"]["w"]),
                                  np.ones((2, 2)))
    np.testing.assert_array_equal(np.asarray(out["head"]["w"]),
                                  np.zeros((5,)))


def test_transfer_load_shape_mismatch_skipped():
    src = {"backbone": {"w": jnp.ones((3, 3))}}
    tgt = {"backbone": {"w": jnp.zeros((2, 2))}}
    out = ckpt.transfer_load(tgt, src, verbose=False)
    np.testing.assert_array_equal(np.asarray(out["backbone"]["w"]),
                                  np.zeros((2, 2)))


# ---------------------------------------------------------------------------
# Shared mid-epoch (step-level) helpers — both drivers route through these
# ---------------------------------------------------------------------------

def _step_payload(epoch, batch_idx, seed=0):
    p = _payload(seed)
    p.update(epoch=epoch, batch_idx=batch_idx)
    return p


def test_mid_epoch_step_id_monotone():
    import pytest

    ids = [ckpt.mid_epoch_step_id(e, b)
           for e in range(3) for b in (0, 1, 99999)]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    # the pretrain driver folds in its live TB iteration as the offset
    assert (ckpt.mid_epoch_step_id(1, 5, offset=7)
            == 7 + ckpt.mid_epoch_step_id(1, 5))
    with pytest.raises(AssertionError):
        ckpt.mid_epoch_step_id(0, 100000)


def test_resume_mid_epoch_honors_newest_step(tmp_path):
    mgr = ckpt.make_manager(str(tmp_path / "steps"), keep_best=False)
    ckpt.save(mgr, ckpt.mid_epoch_step_id(2, 4), _step_payload(2, 4, seed=9))
    payload, epoch, batch = ckpt.resume_mid_epoch(
        mgr, jax.tree.map(jnp.zeros_like, _step_payload(0, 0)),
        start_epoch=2)
    assert payload is not None and epoch == 2 and batch == 5
    assert int(payload["step"]) == 9  # the saved state came back


def test_resume_mid_epoch_stale_step_superseded_by_epoch_ckpt(tmp_path):
    # an epoch-level checkpoint written AFTER the step file moves
    # start_epoch past it; the stale step payload must be ignored
    mgr = ckpt.make_manager(str(tmp_path / "steps"), keep_best=False)
    ckpt.save(mgr, ckpt.mid_epoch_step_id(2, 4), _step_payload(2, 4))
    payload, epoch, batch = ckpt.resume_mid_epoch(
        mgr, jax.tree.map(jnp.zeros_like, _step_payload(0, 0)),
        start_epoch=3)
    assert payload is None and epoch == 3 and batch == 0


def test_resume_mid_epoch_empty_dir(tmp_path):
    mgr = ckpt.make_manager(str(tmp_path / "steps"), keep_best=False)
    payload, epoch, batch = ckpt.resume_mid_epoch(
        mgr, jax.tree.map(jnp.zeros_like, _step_payload(0, 0)),
        start_epoch=1)
    assert payload is None and epoch == 1 and batch == 0


def test_async_save_lands_after_flush(tmp_path):
    """block=False hands the payload to Orbax's async writer (the train
    loop keeps stepping); wait_until_finished flushes it to disk intact —
    the drivers call that at loop end and Orbax back-pressures a new
    save on the previous one."""
    mgr = ckpt.make_manager(str(tmp_path / "steps"), keep_best=False)
    ckpt.save(mgr, 1, _payload(3), block=False)
    ckpt.save(mgr, 2, _payload(7), block=False)  # back-pressures on #1
    mgr.wait_until_finished()
    step, p = ckpt.restore_latest(
        mgr, jax.tree.map(jnp.zeros_like, _payload(0)))
    assert step == 2 and int(p["step"]) == 7
