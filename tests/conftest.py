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
