"""Test harness config: force an 8-device virtual CPU mesh.

Multi-device semantics (shard-local negative pools, psum'd grads,
cross-replica BN) are tested on fake CPU devices — JAX's standard trick —
so the suite runs anywhere, including the single-chip TPU CI box.

NOTE: this box pins JAX_PLATFORMS=axon (a remote-TPU tunnel) and its
sitecustomize imports jax at interpreter startup, so env-var overrides are
too late.  ``jax.config.update`` still works because backends initialise
lazily; it also avoids a multi-minute teardown hang in the tunnel client.
XLA_FLAGS is likewise read lazily at first backend init.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: every driver-level test builds fresh
# jitted closures for the same handful of programs (and re-runs recompile
# them from scratch) — fingerprint-keyed cache hits cut suite wall time
# substantially on this 1-core box.  Same mechanism production uses
# (--compilation_cache in the drivers).
_cache = os.path.expanduser("~/.cache/dpc_tpu/xla_test")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running golden parity at the flagship/published shape")
