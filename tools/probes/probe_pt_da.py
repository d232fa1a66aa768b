"""Pretrain step with --device_augment: cost of the on-device recipes
(round-3; after the uint8-late-conversion + matmul-resample rewrite).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_pt_da.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dpc_tpu.core.config import DPCConfig, TrainConfig
from dpc_tpu.models import dpc as dpc_model
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import optim, pretrain_step
from dpc_tpu.train.bench_breakdown import scalarize

B, ITERS = 64, 20
m = DPCConfig(img_dim=128, compute_dtype="bfloat16")
mesh = meshlib.make_mesh(0)
params = dpc_model.init_dpc(jax.random.PRNGKey(0), m)
key = jax.random.PRNGKey(1)

for name, da, recipe, shape, dtype in [
        ("no augment (float 128^2)", False, "crop_resize",
         (B, m.num_seq, m.seq_len, 128, 128, 3), np.float32),
        ("ucf crop_resize (uint8 224^2)", True, "crop_resize",
         (B, m.num_seq, m.seq_len, 224, 224, 3), np.uint8),
        ("k400 sized_crop (uint8 150x200)", True, "sized_crop",
         (B, m.num_seq, m.seq_len, 150, 200, 3), np.uint8)]:
    t = TrainConfig(batch_size=B, lr=1e-3, wd=1e-5, device_augment=da,
                    device_augment_recipe=recipe, donate=False)
    tx = optim.pretrain_optimizer(params, t.lr, t.wd, t.train_what)
    state = meshlib.replicate(mesh, pretrain_step.TrainState(
        params, tx.init(params), jnp.zeros((), jnp.int32)))
    step = pretrain_step.make_pretrain_step(m, t, mesh, tx)

    def run(state, xb):
        # return the updated state too — else XLA DCEs backward+Adam
        st, metrics = step(state, xb, key)
        return st.params, metrics

    fn = scalarize(run)
    # device-side synthesis: a multi-hundred-MB host->device transfer
    # hangs intermittently on the tunnelled backend (SKILL.md)
    if dtype == np.uint8:
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
