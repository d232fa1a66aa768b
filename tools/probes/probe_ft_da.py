"""Finetune step with vs without --device_augment (round-3).

Measures what moving the finetune crop/flip/jitter into the jitted step
costs on-chip (the host side it replaces is ~10x per-core throughput,
docs/RESULTS.md).  R18-128 batch 32, scalar-fetch protocol.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_ft_da.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dpc_tpu.core.config import DPCConfig, EvalConfig
from dpc_tpu.models import lc
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import finetune_step, optim
from dpc_tpu.train.bench_breakdown import scalarize

B, ITERS = 32, 20
m = DPCConfig(img_dim=128, compute_dtype="bfloat16")
mesh = meshlib.make_mesh(0)
params, bn = lc.init_lc(jax.random.PRNGKey(0), m, num_classes=101)
labels = jnp.asarray(np.random.default_rng(0).integers(0, 101, (B,)))
key = jax.random.PRNGKey(1)

for name, da, shape, dtype in [
        ("host-augmented (float 128^2 in)", False,
         (B, m.num_seq, m.seq_len, 128, 128, 3), jnp.float32),
        ("device_augment (uint8 240x320 windows)", True,
         (B, m.num_seq, m.seq_len, 240, 320, 3), jnp.uint8)]:
    e = EvalConfig(batch_size=B, device_augment=da)
    tx = optim.finetune_optimizer(params, e.lr, e.wd, e.train_what,
                                  e.backbone_lr_scale)
    state = meshlib.replicate(mesh, finetune_step.FinetuneState(
        params, bn, tx.init(params), jnp.zeros((), jnp.int32)))
    step = finetune_step.make_finetune_step(m, e, mesh, tx, donate=False)

    def run(state, xb):
        # return the updated state too: without it XLA dead-code
        # eliminates the whole backward+Adam and the "step" times
        # forward-only (the first version of this probe did exactly
        # that and read 3x too fast)
        st, metrics = step(state, xb, labels, key, jnp.float32(1.0))
        return st.params, metrics

    fn = scalarize(run)
    # device-side synthesis: a multi-hundred-MB host->device transfer
    # hangs intermittently on the tunnelled backend (SKILL.md)
    if dtype == jnp.uint8:
        xb = jax.jit(lambda k: jax.random.randint(
            k, shape, 0, 255, jnp.int32).astype(jnp.uint8))(
                jax.random.PRNGKey(7))
    else:
        xb = jax.jit(lambda k: jax.random.normal(
            k, shape, jnp.float32))(jax.random.PRNGKey(7))
    jax.block_until_ready(xb)
    s = fn(state, xb); float(s)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s = fn(state, xb)
    float(s)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name}: {ms:.1f} ms/step = {B / ms * 1e3:.1f} clips/s/chip")
