"""Shared epoch-loop runtime for the pretrain and finetune drivers.

The reference hot loops (``dpc/main.py:187-246``, ``eval/test.py:218-277``)
fetch every metric scalar eagerly, blocking the device each step.  Here
metrics stay on device until the NEXT step has been dispatched (a one-deep
drain, the same pipeline ``evaluate.run_test`` uses for dense testing), so
the host↔device round-trip overlaps the running step and the device never
idles between steps.  Also home to the driver resilience shared by both
loops: SIGTERM/SIGINT preemption guard and the HBM-OOM detector behind
the remat fallback.
"""

from __future__ import annotations

import math
import signal
import time


class PreemptionGuard:
    """SIGTERM/SIGINT → finish the current step, checkpoint, exit cleanly.

    TPU VMs are routinely preempted; the reference would lose everything
    since its last epoch boundary.  Installed by the drivers when
    mid-epoch checkpointing is enabled.
    """

    def __init__(self):
        self.requested = False
        self._prev = {}

    def install(self):
        for sig in (signal.SIGTERM, signal.SIGINT):
            self._prev[sig] = signal.signal(sig, self._handler)
        return self

    def _handler(self, signum, frame):
        print(f"[preemption] signal {signum} received; will checkpoint "
              "after the current step", flush=True)
        self.requested = True

    def uninstall(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)


def is_oom(exc: Exception) -> bool:
    """True when a compile/execute failure is an HBM capacity failure —
    the case the drivers recover from by rebuilding the step with
    rematerialization instead of dying."""
    msg = str(exc)
    return "Ran out of memory" in msg or "RESOURCE_EXHAUSTED" in msg


def _rows_of(batch) -> int:
    if isinstance(batch, (tuple, list)):
        batch = batch[0]
    return batch.shape[0]


def run_epoch(dispatch, loader, meters, *, mode: str = "train",
              print_freq: int = 5, epoch: int = 0, print_fn=None,
              max_steps: int = 0, start_batch: int = 0,
              step_save_fn=None, save_every_steps: int = 0,
              guard=None, first_batch_fn=None, train: bool = True):
    """Drive one epoch, pipelined one step deep.

    ``dispatch(idx, batch)`` shards + dispatches step ``idx`` and returns
    its on-device metrics dict (closing over any state it mutates).
    Metrics are fetched only after the FOLLOWING step is in flight;
    finite-checking and printing therefore lag the dispatched step by
    one.  ``print_fn(idx, metrics)``, when given, is called for every
    drained step at ``print_freq`` cadence after the default progress
    line (tensorboard hooks).  Returns the number of steps run.
    """
    tic = time.time()
    it = loader.iterate(start_batch) if hasattr(loader, "iterate") \
        else iter(loader)
    pending = None  # (idx, device_metrics, batch_rows)
    steps = 0

    def drain(entry):
        nonlocal tic
        p_idx, dev_metrics, rows = entry
        metrics = {k: float(v) for k, v in dev_metrics.items()}
        if not math.isfinite(metrics.get("loss", 0.0)):
            if train:
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch} step {p_idx}: "
                    f"{metrics} — rerun with --debug_nans to locate the op")
            # a stray non-finite VAL batch must not kill a finished train
            # epoch before its checkpoint lands; the reference's validate
            # just averages whatever it got (eval/test.py:278-301)
            print(f"[{mode}] WARNING: non-finite loss at epoch {epoch} "
                  f"step {p_idx}: {metrics}", flush=True)
        meters.update(metrics, n=rows)
        if p_idx % print_freq == 0:
            dt = time.time() - tic
            tic = time.time()
            # flush: progress lines must reach piped logs (nohup,
            # supervisors) promptly — a preempted run's last lines are
            # its forensic record, and the preemption tests gate SIGTERM
            # on seeing them in real time
            print(f"[{mode}] epoch {epoch} [{p_idx}/{len(loader)}] "
                  + " ".join(f"{k} {v:.4f}" for k, v in metrics.items())
                  + f" ({dt:.2f}s)", flush=True)
            if print_fn is not None:
                print_fn(p_idx, metrics)

    last_idx = start_batch - 1     # last DISPATCHED batch index
    for idx, batch in enumerate(it, start=start_batch):
        if max_steps and idx >= max_steps:
            break
        if first_batch_fn is not None:
            first_batch_fn(batch)
            first_batch_fn = None
        last_idx = idx
        metrics = dispatch(idx, batch)
        # Start the device->host copy NOW so it overlaps this step's
        # compute; drain()'s float() one iteration later then finds the
        # scalars already on host.  Without this every drain pays the
        # full host<->device round-trip (measured ~40 ms/step over the
        # axon tunnel: docs/RESULTS.md round-3 loop study).
        for v in metrics.values():
            if hasattr(v, "copy_to_host_async"):
                v.copy_to_host_async()
        steps += 1
        if pending is not None:
            drain(pending)
        pending = (idx, metrics, _rows_of(batch))
        preempted = guard is not None and guard.requested
        # val epochs save only on preemption (the caller's step_save_fn
        # closure decides what to persist — typically the train state at
        # end-of-train-epoch position, so resume skips straight to val);
        # periodic saves are train-only
        if (step_save_fn is not None
                and (preempted or (train and save_every_steps
                                   and (idx + 1) % save_every_steps == 0))):
            # the checkpoint persists step idx's parameter update:
            # finite-check THIS step (not just the lagging pending one)
            # before writing, so a NaN step can never be saved and then
            # resumed from — drain raises on non-finite loss
            drain(pending)
            pending = None
            # periodic saves may hand off to Orbax's async writer (the
            # loop keeps stepping while the write lands); a preemption
            # save must be on disk before the SystemExit below
            step_save_fn(epoch, idx, block=preempted)
        if preempted:
            if pending is not None:
                drain(pending)
            raise SystemExit("[preemption] checkpointed and exiting")
    if pending is not None:
        drain(pending)
    # a signal that lands during the LAST step's drain would otherwise
    # ride past the epoch boundary (summary, epoch checkpoint, next
    # epoch's first step) before the next in-loop check — exit at the
    # boundary instead, checkpointing the completed-steps position
    if guard is not None and guard.requested and steps > 0:
        if step_save_fn is not None:
            # last_idx, not the loop variable: a --steps_per_epoch break
            # leaves idx at the batch that was never dispatched, and the
            # off-by-one id would dodge the drivers' duplicate-save
            # dedupe (resume position is the same either way)
            step_save_fn(epoch, last_idx, block=True)
        raise SystemExit("[preemption] checkpointed and exiting")
    return steps
