"""Post-fused-stem batch sweep + remaining-lever A/Bs on the real chip."""
import time
import jax, jax.numpy as jnp
from dpc_tpu.core.config import DPCConfig, TrainConfig
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import optim, pretrain_step
from dpc_tpu.models import dpc

ITERS = 20

def bench(batch, **tkw):
    cfg = DPCConfig(compute_dtype="bfloat16")
    tcfg = TrainConfig(batch_size=batch, lr=1e-3, wd=1e-5,
                       negatives="local", donate=True, **tkw)
    mesh = meshlib.make_mesh(1)
    params = dpc.init_dpc(jax.random.PRNGKey(0), cfg)
    tx = optim.pretrain_optimizer(params, tcfg.lr, tcfg.wd)
    state = meshlib.replicate(mesh, pretrain_step.TrainState(
        params, tx.init(params), jnp.zeros((), jnp.int32)))
    step = pretrain_step.make_pretrain_step(cfg, tcfg, mesh, tx)
    x = jax.random.normal(jax.random.PRNGKey(1),
        (batch, cfg.num_seq, cfg.seq_len, cfg.img_dim, cfg.img_dim, 3),
        jnp.float32)
    xb = meshlib.shard_batch(mesh, x)
    key = jax.random.PRNGKey(2)
    state, m = step(state, xb, key); float(m["loss"])
    state, m = step(state, xb, key); float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, xb, key)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"batch {batch} {tkw}: {dt*1e3:.1f} ms/step = "
          f"{batch/dt:.1f} clips/s", flush=True)

for b in (64, 96, 128):
    try:
        bench(b)
    except Exception as e:
        print(f"batch {b}: {type(e).__name__} {str(e)[:100]}", flush=True)
