"""Checkpoint save / resume / transfer-load.

Capability parity with the reference (SURVEY §5 "Checkpoint / resume"):
  * rolling latest + single best retention (``utils/utils.py:14-26``) via an
    Orbax ``CheckpointManager``;
  * payload {params, opt_state, step, epoch, best_acc, and BN state when
    tracked} (``dpc/main.py:168-174``);
  * resume restores optimizer state unless the caller resets the LR
    (``--reset_lr``, ``dpc/main.py:97-99``);
  * transfer loading from a *different* model (DPC → LC) by pytree-path
    intersection — our ``neq_load_customized`` equivalent — plus direct
    ingest of reference ``.pth.tar`` files via
    :mod:`dpc_tpu.utils.torch_compat`.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from dpc_tpu.utils import torch_compat as tc


def is_torch_file(path: str) -> bool:
    """One definition of "is this a torch checkpoint file": every caller
    (``load_pretrained``, the drivers' ``--pretrain``/``--test``
    branches) must agree, or a suffix like ``.pt`` ends up torch-loaded
    on one path and Orbax-run-dir-probed on another."""
    return path.endswith((".pth", ".tar", ".pt"))  # .pth.tar ⊂ .tar


def make_manager(directory: str, max_to_keep: int = 1,
                 keep_best: bool = True, *,
                 read_only: bool = False) -> ocp.CheckpointManager:
    """Rolling-latest (+ best) checkpoint manager.

    ``read_only``: restore-only callers (``load_pretrained``, the test
    driver) must not require write access to the source — no mkdir, and
    a clear error instead of silently creating junk dirs on a typo."""
    directory = os.path.abspath(directory)
    if read_only:
        if not os.path.isdir(directory):
            raise FileNotFoundError(f"no checkpoint directory {directory}")
    else:
        os.makedirs(directory, exist_ok=True)
    kwargs = dict(max_to_keep=max_to_keep,
                  keep_checkpoints_without_metrics=True)
    if keep_best:
        kwargs.update(max_to_keep=max_to_keep + 1,
                      best_fn=lambda m: m.get("val_acc", 0.0),
                      best_mode="max")
    options = ocp.CheckpointManagerOptions(**kwargs)
    return ocp.CheckpointManager(directory, options=options)


def save(mgr: ocp.CheckpointManager, epoch: int, payload: Any,
         metrics: Optional[dict] = None, block: bool = True) -> None:
    """Save a checkpoint for ``epoch``.

    ``block=False`` returns as soon as the (already host-side) payload is
    handed to Orbax's async writer, so a periodic mid-epoch save never
    stalls the train loop for the serialize+write time; Orbax itself
    back-pressures (a new save waits for the previous one).  Callers that
    exit right after — preemption saves, epoch-end saves — must block, and
    the drivers flush in-flight writes (``mgr.wait_until_finished``) when
    the epoch loop ends."""
    mgr.save(epoch, args=ocp.args.StandardSave(payload),
             metrics={k: float(v) for k, v in (metrics or {}).items()})
    if block:
        mgr.wait_until_finished()


def restore_latest(mgr: ocp.CheckpointManager, template: Any
                   ) -> tuple[Optional[int], Any]:
    """Restore the newest checkpoint into ``template``'s structure.

    Returns (epoch, payload) or (None, template) when nothing is saved.
    """
    step = mgr.latest_step()
    if step is None:
        return None, template
    payload = mgr.restore(step, args=ocp.args.StandardRestore(template))
    return step, payload


def restore_best(mgr: ocp.CheckpointManager, template: Any
                 ) -> tuple[Optional[int], Any]:
    step = mgr.best_step()
    if step is None:
        return restore_latest(mgr, template)
    return step, mgr.restore(step, args=ocp.args.StandardRestore(template))


# ---------------------------------------------------------------------------
# Mid-epoch (step-level) checkpoints — preemption recovery beyond the
# reference's epoch granularity (SURVEY §5 "failure detection").  Both
# drivers route through these two helpers so the save-side step-id
# encoding and the resume-side gate can never drift apart.
# ---------------------------------------------------------------------------

def mid_epoch_step_id(epoch: int, batch_idx: int, offset: int = 0) -> int:
    """Monotone Orbax step id for a mid-epoch checkpoint.

    ``offset`` lets the pretrain driver fold in its live TB iteration so
    ids stay monotone when ``--steps_per_epoch`` truncates epochs; the
    finetune driver passes 0.  100000 bounds batches/epoch, asserted at
    save time."""
    assert batch_idx < 100000, (
        f"mid-epoch step id would collide: batch {batch_idx} >= 100000 "
        "per-epoch namespace")
    return offset + batch_idx + epoch * 100000


def save_step_unless_duplicate(step_mgr: ocp.CheckpointManager, sid: int,
                               payload_fn, block: bool = True) -> None:
    """Save a mid-epoch checkpoint unless ``sid`` is already the latest.

    The subtle part both drivers must agree on: a duplicate request
    (val-time preemption re-requesting the train position, or the
    epoch-boundary guard right after a periodic save) is SKIPPED — but
    the skipped save may have been handed to Orbax's ASYNC writer, and a
    blocking request precedes a SystemExit, so the bytes must be flushed
    to disk before the process dies.  ``payload_fn`` defers the
    ``jax.device_get`` to the non-duplicate case."""
    if step_mgr.latest_step() == sid:
        if block:
            step_mgr.wait_until_finished()
        return
    save(step_mgr, sid, payload_fn(), block=block)


def resume_mid_epoch(mgr: ocp.CheckpointManager, template: Any,
                     start_epoch: int) -> tuple[Any, int, int]:
    """Shared mid-epoch resume gate: the newest step-level checkpoint is
    honored only when it is at/after the epoch-level resume point (an
    epoch checkpoint written later supersedes stale step files).

    Returns ``(payload | None, start_epoch, start_batch)`` — the first
    batch NOT yet run, i.e. ``batch_idx + 1`` of the saved step."""
    gstep, payload = restore_latest(mgr, template)
    if gstep is None or int(payload["epoch"]) < start_epoch:
        return None, start_epoch, 0
    return payload, int(payload["epoch"]), int(payload["batch_idx"]) + 1


# ---------------------------------------------------------------------------
# Transfer loading (our neq_load_customized)
# ---------------------------------------------------------------------------

def transfer_load(target: Any, source: Any, verbose: bool = True) -> Any:
    """Path-intersection load: copy every leaf whose flattened path exists
    in both trees with a matching shape; report the rest.

    The cross-model transfer mechanism (DPC pretrain → LC finetune), same
    contract as ``neq_load_customized`` (``backbone/resnet_2d3d.py:310-333``).
    """
    tgt_flat = tc.flatten_pytree(target)
    src_flat = tc.flatten_pytree(source)
    loaded, skipped_shape = [], []
    import jax.numpy as jnp

    for path, val in src_flat.items():
        if path in tgt_flat:
            if tgt_flat[path].shape == val.shape:
                tc.set_in_pytree(target, path, jnp.asarray(val))
                loaded.append(path)
            else:
                skipped_shape.append(path)
    unused = [p for p in src_flat if p not in tgt_flat]
    missing = [p for p in tgt_flat if p not in src_flat]
    if verbose:
        print(f"[transfer_load] loaded {len(loaded)} tensors; "
              f"{len(unused)} unused; {len(missing)} not-loaded; "
              f"{len(skipped_shape)} shape-mismatched")
        for p in unused:
            print("  unused:", p)
        for p in missing:
            print("  missing:", p)
        for p in skipped_shape:
            print("  shape-mismatch:", p)
    return target


def load_pretrained(path: str, params: Any, key_map_fn,
                    verbose: bool = True) -> Any:
    """Load pretrained weights from either a reference ``.pth.tar`` torch
    checkpoint or one of our Orbax run directories (``--pretrain`` behaviour,
    ``dpc/main.py:104-112`` / ``eval/test.py:149-158``)."""
    if is_torch_file(path):
        params, _ = tc.load_reference_checkpoint(
            path, params, key_map_fn(params), verbose=verbose)
        return params
    if os.path.isdir(os.path.join(path, "model")):  # run dir → model subdir
        path = os.path.join(path, "model")
    mgr = make_manager(path, read_only=True)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    src = mgr.restore(step, args=ocp.args.StandardRestore())
    src_params = src.get("params", src) if isinstance(src, dict) else src
    return transfer_load(params, src_params, verbose=verbose)
