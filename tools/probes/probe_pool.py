"""Bound the stem-pool backward's in-context cost: full step vs a step
whose pool is replaced by stride-2 subsampling (value-wrong, traffic-light)."""
import time
import jax, jax.numpy as jnp, numpy as np
from dpc_tpu.core.config import DPCConfig, TrainConfig
from dpc_tpu.models import layers as L
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import optim, pretrain_step
from dpc_tpu.train.bench_breakdown import scalarize

ITERS = 20
def timeit(fn, *a):
    s = fn(*a); float(s)
    t0 = time.perf_counter()
    for _ in range(ITERS): s = fn(*a)
    float(s)
    return (time.perf_counter()-t0)/ITERS*1e3

B = 64
m = DPCConfig(compute_dtype="bfloat16")
t = TrainConfig(batch_size=B, lr=1e-3, wd=1e-5, donate=False)
mesh = meshlib.make_mesh(0)
from dpc_tpu.models import dpc as dm
params = dm.init_dpc(jax.random.PRNGKey(0), m)
tx = optim.pretrain_optimizer(params, t.lr, t.wd, t.train_what)
state = meshlib.replicate(mesh, pretrain_step.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)))
step = pretrain_step.make_pretrain_step(m, t, mesh, tx)
x = jax.random.normal(jax.random.PRNGKey(1), (B, m.num_seq, m.seq_len, m.img_dim, m.img_dim, 3), jnp.bfloat16).astype(jnp.float32)
xb = meshlib.shard_batch(mesh, x)
key = jax.random.PRNGKey(2)
def make_scalar(stepfn):
    def s(state, xb, key):
        st, metrics = stepfn(state, xb, key)
        # touch every updated leaf: nothing may be dead-code-eliminated
        leaves = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(st.params))
        return metrics["loss"] + 0.0 * leaves
    return jax.jit(s)
f = make_scalar(step)
print("full step ms:", timeit(f, state, xb, key), flush=True)

# replace the pool with stride-2 slicing (keeps shapes, kills pool traffic)
orig = L._maxpool_sas_raw
def fake_pool(xs):
    xp = jnp.pad(xs, ((0,0),(0,0),(1,1),(1,1),(0,0)), constant_values=-jnp.inf)
    return xp[:, :, 1:-1:2, 1:-1:2, :]
L._maxpool_sas_raw = fake_pool
step2 = pretrain_step.make_pretrain_step(m, t, mesh, tx)
f2 = make_scalar(step2)
print("no-pool step ms:", timeit(f2, state, xb, key), flush=True)
L._maxpool_sas_raw = orig
