"""Tracing / profiling / debug hooks (SURVEY §5 "auxiliary subsystems").

The reference's entire observability is a per-iteration wall-clock print
(``dpc/main.py:195,238-239``).  TPU-native equivalents:

  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-viewable trace (`--profile <dir>` on the drivers);
  * :class:`StepTimer` — ``block_until_ready``-bracketed step timing with
    percentile summaries (async dispatch makes naive timing meaningless);
  * :func:`enable_debug` — NaN/Inf checking (``jax_debug_nans``) and
    disable-jit escape hatch for a debug config.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Profile everything inside the block into ``log_dir`` (no-op when
    None).  View with TensorBoard's profile plugin or xprof."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"[profiling] trace written to {log_dir}")


def enable_debug(nan_checks: bool = True, disable_jit: bool = False) -> None:
    """Debug configuration: fail fast on NaN/Inf, optionally run eagerly."""
    if nan_checks:
        jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)


def enable_compilation_cache(path: str) -> None:
    """Point JAX's persistent compilation cache at ``path`` (created if
    missing).  Production recipes here are 300-epoch preemptible runs
    (``eval/test.py:33``): with the cache on, a restarted process skips
    the multi-minute XLA recompile of the train/eval/test programs and
    resumes stepping in seconds.  Safe to share between runs — entries
    are keyed by program/compiler fingerprint; JAX only persists
    compilations slower than its min-compile-time threshold.

    JAX binds the persistent cache object at the FIRST compilation after
    the dir is set; if this process already compiled something (e.g. a
    test harness bound a suite-wide cache dir first), updating the config
    alone is a silent no-op — entries keep landing in the old dir.  Reset
    the live cache so the rebind actually takes."""
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    from jax.experimental.compilation_cache import compilation_cache as _cc

    _cc.reset_cache()
    jax.config.update("jax_compilation_cache_dir", path)


class StepTimer:
    """Wall-clock step timing that respects async dispatch.

    Call ``tick(result)`` once per step with any device value from the
    step; the timer blocks on it, records the delta, and reports
    mean/p50/p99 and items/sec.
    """

    def __init__(self, items_per_step: int = 1, warmup: int = 2):
        self.items_per_step = items_per_step
        self.warmup = warmup
        self.times: list[float] = []
        self._count = 0
        self._last: Optional[float] = None

    def tick(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt = 0.0
        if self._last is not None:
            dt = now - self._last
            self._count += 1
            if self._count > self.warmup:
                self.times.append(dt)
        self._last = now
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p99_ms": float(np.percentile(arr, 99) * 1e3),
            "items_per_sec": float(self.items_per_step / arr.mean()),
        }
