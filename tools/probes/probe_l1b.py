"""Decompose layer1 cost: conv floor vs BN/elementwise traffic; dump the
fusion kernels of the current backward."""
import time
import jax, jax.numpy as jnp, numpy as np
from dpc_tpu.models import layers as L, resnet2d3d as R
from dpc_tpu.train.bench_breakdown import scalarize

ITERS = 30

def timeit(fn, *args):
    s = fn(*args); float(s)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / ITERS * 1e3

dtype = jnp.bfloat16
B, T, H, W, C = 512, 5, 32, 32, 64
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, T, H, W, C), dtype)

specs = R._block_specs("resnet18")[0]
params = [R._init_block(jax.random.PRNGKey(i + 1), s, False)[0]
          for i, s in enumerate(specs)]

def convs_only(params, x):
    h = x
    for p in params:
        h = L.conv3d(p["conv1"], h, (1, 1, 1), (0, 1, 1), dtype)
        h = L.conv3d(p["conv2"], h, (1, 1, 1), (0, 1, 1), dtype)
    return h

def bn_relu_only(params, x):
    h = x
    for p in params:
        h, _ = L.batchnorm(p["bn1"], None, h, train=True)
        h = jax.nn.relu(h)
        h, _ = L.batchnorm(p["bn2"], None, h, train=True)
        h = h + x
        h = jax.nn.relu(h)
    return h

def layer1(params, x):
    h = x
    for p, spec in zip(params, specs):
        h, _ = R._apply_block(p, None, spec, h, train=True,
                              dtype=dtype, axis_name=None)
    return h

noop = scalarize(lambda v: v[0, 0, 0, 0, 0])
base = timeit(noop, x)
print(f"noop {base:.2f} ms")
for name, fn in [("convs_only", convs_only), ("bn_relu_only", bn_relu_only),
                 ("layer1", layer1)]:
    f = scalarize(fn)
    g = scalarize(jax.grad(
        lambda pp, v: jnp.sum(fn(pp, v).astype(jnp.float32) ** 2), (0, 1)))
    print(f"{name:14s} fwd {timeit(f, params, x)-base:7.2f} ms   "
          f"fwd+bwd {timeit(g, params, x)-base:7.2f} ms", flush=True)

# fusion inventory of the layer1 backward
comp = jax.jit(jax.grad(
    lambda pp, v: jnp.sum(layer1(pp, v).astype(jnp.float32) ** 2),
    (0, 1))).lower(params, x).compile()
txt = comp.as_text()
import re, collections
kinds = collections.Counter()
for m in re.finditer(r'fusion\(', txt):
    kinds['fusion'] += 1
for m in re.finditer(r'(convolution|reduce|fusion)\.?\d* = ', txt):
    kinds[m.group(1)] += 1
print(kinds)
with open('/tmp/layer1_bwd.hlo', 'w') as f:
    f.write(txt)
print("hlo dumped")
