"""T-trivial conv3d (k=(1,3,3)) vs conv2d on [B*T, H, W, C]: does XLA
pick better forward/wgrad kernels for the 4D form?"""
import time, functools
import jax, jax.numpy as jnp, numpy as np
from dpc_tpu.train.bench_breakdown import scalarize

ITERS = 30
def timeit(fn, *a):
    s = fn(*a); float(s)
    t0 = time.perf_counter()
    for _ in range(ITERS): s = fn(*a)
    float(s)
    return (time.perf_counter()-t0)/ITERS*1e3

D3 = ("NDHWC", "DHWIO", "NDHWC")
D2 = ("NHWC", "HWIO", "NHWC")
key = jax.random.PRNGKey(0)

def bench(name, shape, cin, cout, k, stride):
    x3 = jax.random.normal(key, shape, jnp.bfloat16)
    w3 = jax.random.normal(key, (1, k, k, cin, cout), jnp.bfloat16)
    w2 = w3[0]
    B, T, H, W, C = shape
    x2 = x3.reshape(B*T, H, W, C)
    def c3(x, w):
        return jax.lax.conv_general_dilated(x, w, (1, stride, stride),
            [(0,0),(k//2,)*2,(k//2,)*2], dimension_numbers=D3)
    def c2(x, w):
        return jax.lax.conv_general_dilated(x, w, (stride, stride),
            [(k//2,)*2,(k//2,)*2], dimension_numbers=D2)
    noop = scalarize(lambda v: v[0,0,0,0])
    base = timeit(noop, x2)
    for tag, f, xx, ww in [("3d", c3, x3, w3), ("2d", c2, x2, w2)]:
        fw = scalarize(f)
        g = scalarize(jax.grad(lambda a, b: jnp.sum(f(a, b).astype(jnp.float32)**2), (0, 1)))
        print(f"{name} {tag}: fwd {timeit(fw, xx, ww)-base:6.2f}  fwd+bwd {timeit(g, xx, ww)-base:6.2f}", flush=True)

bench("layer1 64->64 k3", (512, 5, 32, 32, 64), 64, 64, 3, 1)
bench("layer2 64->128 k3 s2", (512, 5, 32, 32, 64), 64, 128, 3, 2)
bench("stem 3->64 k7 s2", (512, 5, 128, 128, 3), 3, 64, 7, 2)
