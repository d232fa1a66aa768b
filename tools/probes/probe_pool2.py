"""Lower-bound the pool backward: custom_vjp whose bwd only WRITES dsrc
(zeros) — the unavoidable 1.3GB write, no scatter/compare work."""
import time, functools
import jax, jax.numpy as jnp
from dpc_tpu.core.config import DPCConfig, TrainConfig
from dpc_tpu.models import layers as L
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import optim, pretrain_step
from dpc_tpu.models import dpc

ITERS = 20
def run(tag):
    B = 64
    m = DPCConfig(compute_dtype="bfloat16")
    t = TrainConfig(batch_size=B, lr=1e-3, wd=1e-5, donate=False)
    mesh = meshlib.make_mesh(0)
    params = dpc.init_dpc(jax.random.PRNGKey(0), m)
    tx = optim.pretrain_optimizer(params, t.lr, t.wd, t.train_what)
    state = meshlib.replicate(mesh, pretrain_step.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)))
    step = pretrain_step.make_pretrain_step(m, t, mesh, tx)
    def s(state, xb, key):
        st, metrics = step(state, xb, key)
        leaves = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(st.params))
        return metrics["loss"] + 1e-30 * leaves
    f = jax.jit(s)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, m.num_seq, m.seq_len, m.img_dim, m.img_dim, 3), jnp.float32)
    xb = meshlib.shard_batch(mesh, x)
    key = jax.random.PRNGKey(2)
    v = f(state, xb, key); float(v); v = f(state, xb, key); float(v)
    t0 = time.perf_counter()
    for _ in range(ITERS): v = f(state, xb, key)
    float(v)
    dt = (time.perf_counter()-t0)/ITERS*1e3
    print(f"{tag}: {dt:.1f} ms/step = {B/dt*1e3:.1f} clips/s", flush=True)

run("baseline (sas)")

@jax.custom_vjp
def zpool(xs):
    return L._maxpool_sas_raw.__wrapped__(xs) if hasattr(L._maxpool_sas_raw, "__wrapped__") else _raw(xs)
def _raw(xs):
    return L.maxpool3d(xs, (1, 3, 3), (1, 2, 2), (0, 1, 1))
def _zf(xs):
    return _raw(xs), xs.shape
def _zb(shape, g):
    return (jnp.zeros(shape, g.dtype),)
zpool.defvjp(_zf, _zb)

orig = L._maxpool_sas_raw
L._maxpool_sas_raw = zpool
run("zero-bwd pool (lower bound)")
L._maxpool_sas_raw = orig
