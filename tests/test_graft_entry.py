"""Driver-contract tests for ``__graft_entry__``.

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip(n)`` to validate the multi-chip sharding.  These tests
pin both contracts: entry() must trace/lower under jit, and the dryrun must
succeed from a process whose jax backend is ALREADY initialized on the
wrong platform (the exact failure mode of round 1 — the subprocess re-exec
must isolate the child from the parent's backend state).
"""

import sys

import jax

sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft  # noqa: E402


def test_entry_traces_and_lowers():
    fn, args = graft.entry()
    lowered = jax.jit(fn).lower(*args)  # full trace + StableHLO lowering
    assert "stablehlo" in lowered.as_text()[:10000]


def test_dryrun_multichip_from_initialized_parent():
    jax.devices()  # poison the parent: backend now initialized
    graft.dryrun_multichip(8)  # must still succeed via subprocess re-exec
