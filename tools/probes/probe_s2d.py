"""Space-to-depth stem conv: equivalence + full-step timing."""
import time
import jax, jax.numpy as jnp, numpy as np
from dpc_tpu.models import layers as L

def s2d_conv(p, x, stride, padding, dtype):
    """k(1,7,7) s(1,2,2) p(0,3,3) conv == k(1,4,4) s1 conv on 2x2
    space-to-depth input with front-zero-padded reshaped weights."""
    w = p["w"]  # [1, 7, 7, 3, oc]
    B, T, H, W, C = x.shape
    oc = w.shape[-1]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    x6 = x.reshape(B, T, H//2, 2, W//2, 2, C)
    xs = jnp.transpose(x6, (0, 1, 2, 4, 3, 5, 6)).reshape(
        B, T, H//2, W//2, 4*C)
    w8 = jnp.pad(w, ((0,0),(1,0),(1,0),(0,0),(0,0)))  # [1,8,8,C,oc]
    w2 = w8.reshape(1, 4, 2, 4, 2, C, oc)
    w2 = jnp.transpose(w2, (0, 1, 3, 2, 4, 5, 6)).reshape(1, 4, 4, 4*C, oc)
    y = jax.lax.conv_general_dilated(
        xs, w2, (1, 1, 1), [(0,0), (2,1), (2,1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y

# CPU equivalence
key = jax.random.PRNGKey(0)
p = {"w": jax.random.normal(key, (1, 7, 7, 3, 8), jnp.float32)}
x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32, 3), jnp.float32)
a = L.conv3d(p, x, (1,2,2), (0,3,3), None)
b = s2d_conv(p, x, (1,2,2), (0,3,3), None)
print("s2d equiv max|diff|:", float(jnp.max(jnp.abs(a-b))), a.shape, b.shape, flush=True)

# full-step timing with the stem conv swapped
from dpc_tpu.core.config import DPCConfig, TrainConfig
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
    key2 = jax.random.PRNGKey(2)
    v = f(state, xb, key2); float(v); v = f(state, xb, key2); float(v)
    t0 = time.perf_counter()
    for _ in range(ITERS): v = f(state, xb, key2)
    lv = float(v)
    dt = (time.perf_counter()-t0)/ITERS*1e3
    print(f"{tag}: {dt:.1f} ms/step = {B/dt*1e3:.1f} clips/s (loss {lv:.4f})", flush=True)

run("baseline stem")
orig = L.conv3d
def patched(p, x, stride=(1,1,1), padding=(0,0,0), dtype=None):
    w = p["w"]
    if w.ndim == 5 and w.shape[:3] == (1, 7, 7) and stride == (1, 2, 2):
        return s2d_conv(p, x, stride, padding, dtype)
    return orig(p, x, stride, padding, dtype)
L.conv3d = patched
run("s2d stem")
L.conv3d = orig
