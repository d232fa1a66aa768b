"""Isolated pool bwd: SAS vs the new Pallas eq kernel, stem shape."""
import time
import jax, jax.numpy as jnp
from dpc_tpu.models import layers as L
from dpc_tpu.ops import maxpool_pallas as MP
from dpc_tpu.train.bench_breakdown import scalarize

ITERS = 30
def timeit(fn, *a):
    s = fn(*a); float(s)
    t0 = time.perf_counter()
    for _ in range(ITERS): s = fn(*a)
    float(s)
    return (time.perf_counter()-t0)/ITERS*1e3

key = jax.random.PRNGKey(0)
z = jax.random.normal(key, (512, 5, 64, 64, 64), jnp.bfloat16)

noop = scalarize(lambda v: v[0,0,0,0,0])
base = timeit(noop, z)
print(f"noop {base:.2f}", flush=True)

fns = {
    "sas  ": lambda v: L._maxpool_sas_raw(v),
    "eq-pl": lambda v: MP.maxpool_3x3s2_eq(v),
}
for name, f in fns.items():
    fw = scalarize(f)
    g = scalarize(jax.grad(lambda v: jnp.sum(f(v).astype(jnp.float32)**2)))
    print(f"{name} fwd {timeit(fw, z)-base:6.2f}  fwd+bwd {timeit(g, z)-base:6.2f}", flush=True)

# value check on-chip
a = L._maxpool_sas_raw(z.astype(jnp.float32))
b = MP.maxpool_3x3s2_eq(z.astype(jnp.float32))
print("on-chip fwd max|diff|:", float(jnp.max(jnp.abs(a - b))), flush=True)
