"""Layer1 BN-backward fusion probe (round-3 VERDICT #1).

Times, on the real chip with the scalar-fetch protocol:
  A. current layer1 (2 BasicBlock2d, XLA AD through batchnorm)
  B. single conv+BN+ReLU unit (the round-2 reference point)
  C. closed-form custom-VJP BN (saves x-hat bf16, minimal 2-kernel bwd)
  D. whole-block rewrite: custom-VJP bn_relu for unit1 + fused
     BN2+add+[relu] tail custom VJP
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from dpc_tpu.models import layers as L, resnet2d3d as R
from dpc_tpu.train.bench_breakdown import scalarize

ITERS = 30
EPS = 1e-5


def timeit(fn, *args) -> float:
    s = fn(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / ITERS * 1e3


# --------------------------------------------------------------------------
# closed-form BN (+optional relu) with custom VJP
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_act(x, scale, bias, relu: bool):
    y, _ = _bn_fwd_impl(x, scale, bias)
    return jnp.maximum(y, 0) if relu else y


def _bn_fwd_impl(x, scale, bias):
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf - mean), axis=axes)
    inv = jax.lax.rsqrt(var + EPS)
    xhat = ((xf - mean) * inv).astype(x.dtype)
    y = (xhat.astype(jnp.float32) * scale + bias).astype(x.dtype)
    return y, (xhat, inv)


def _bn_act_fwd(x, scale, bias, relu):
    y, (xhat, inv) = _bn_fwd_impl(x, scale, bias)
    out = jnp.maximum(y, 0) if relu else y
    return out, (xhat, inv, scale, bias)


def _bn_act_bwd(relu, res, g):
    xhat, inv, scale, bias = res
    gf = g.astype(jnp.float32)
    xh = xhat.astype(jnp.float32)
    if relu:
        gate = xh * scale + bias > 0
        gf = jnp.where(gate, gf, 0.0)
    axes = tuple(range(g.ndim - 1))
    n = np.prod([g.shape[a] for a in axes]).astype(np.float32)
    s1 = jnp.sum(gf, axis=axes)
    s2 = jnp.sum(gf * xh, axis=axes)
    dx = (inv * scale) * (gf - s1 / n - xh * (s2 / n))
    return dx.astype(g.dtype), s2, s1


bn_act.defvjp(_bn_act_fwd, _bn_act_bwd)


# tail: out = [relu](bn(c2) + res)
@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bn_add_act(c2, scale, bias, resd, relu: bool):
    y, _ = _bn_fwd_impl(c2, scale, bias)
    out = y + resd
    return jnp.maximum(out, 0) if relu else out


def _bat_fwd(c2, scale, bias, resd, relu):
    y, (xhat, inv) = _bn_fwd_impl(c2, scale, bias)
    out = y + resd
    if relu:
        gate = out > 0
        out = jnp.maximum(out, 0)
    else:
        gate = None
    return out, (xhat, inv, scale, gate)


def _bat_bwd(relu, res, g):
    xhat, inv, scale, gate = res
    gf = g.astype(jnp.float32)
    if relu:
        gf = jnp.where(gate, gf, 0.0)
    xh = xhat.astype(jnp.float32)
    axes = tuple(range(g.ndim - 1))
    n = np.prod([g.shape[a] for a in axes]).astype(np.float32)
    s1 = jnp.sum(gf, axis=axes)
    s2 = jnp.sum(gf * xh, axis=axes)
    dx = (inv * scale) * (gf - s1 / n - xh * (s2 / n))
    return dx.astype(g.dtype), s2, s1, gf.astype(g.dtype)


bn_add_act.defvjp(_bat_fwd, _bat_bwd)


def block_fused(p, x, dtype):
    """BasicBlock2d with custom-VJP BN paths (no downsample, stride 1)."""
    out = L.conv3d(p["conv1"], x, (1, 1, 1), (0, 1, 1), dtype)
    out = bn_act(out, p["bn1"]["scale"], p["bn1"]["bias"], True)
    out = L.conv3d(p["conv2"], out, (1, 1, 1), (0, 1, 1), dtype)
    return bn_add_act(out, p["bn2"]["scale"], p["bn2"]["bias"], x, True)


def main():
    dtype = jnp.bfloat16
    B, T, H, W, C = 512, 5, 32, 32, 64
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, H, W, C), dtype)

    specs = R._block_specs("resnet18")
    l1_specs = specs[0]  # layer1: two basic2d blocks, stride 1
    params = []
    for i, spec in enumerate(l1_specs):
        p, _ = R._init_block(jax.random.PRNGKey(i + 1), spec, False)
        params.append(p)

    def layer1_cur(params, x, dt=dtype):
        h = x
        for p, spec in zip(params, l1_specs):
            h, _ = R._apply_block(p, None, spec, h, train=True,
                                  dtype=dt, axis_name=None)
        return h

    def layer1_fused(params, x, dt=dtype):
        h = x
        for p in params:
            h = block_fused(p, h, dt)
        return h

    # value check (fused vs current, f32 on small shape)
    xs = jax.random.normal(key, (8, 5, 16, 16, 64), jnp.float32)
    a = layer1_cur(params, xs, jnp.float32)
    b = layer1_fused(params, xs, jnp.float32)
    print("fwd max|diff|:", float(jnp.max(jnp.abs(a - b))))
    ga = jax.grad(lambda pp, v: jnp.sum(
        layer1_cur(pp, v, jnp.float32) ** 2), (0, 1))(params, xs)
    gb = jax.grad(lambda pp, v: jnp.sum(
        layer1_fused(pp, v, jnp.float32) ** 2), (0, 1))(params, xs)
    md = max(float(jnp.max(jnp.abs(u - v)))
             for u, v in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)))
    print("grad max|diff|:", md)

    fwd_cur = scalarize(layer1_cur)
    fwd_fus = scalarize(layer1_fused)
    vg_cur = scalarize(jax.grad(
        lambda pp, v: jnp.sum(layer1_cur(pp, v).astype(jnp.float32) ** 2),
        (0, 1)))
    vg_fus = scalarize(jax.grad(
        lambda pp, v: jnp.sum(layer1_fused(pp, v).astype(jnp.float32) ** 2),
        (0, 1)))

    noop = scalarize(lambda v: v[0, 0, 0, 0, 0])
    base = timeit(noop, x)
    print(f"noop latency {base:.2f} ms")
    print(f"layer1 cur   fwd {timeit(fwd_cur, params, x) - base:.2f} ms  "
          f"fwd+bwd {timeit(vg_cur, params, x) - base:.2f} ms")
    print(f"layer1 fused fwd {timeit(fwd_fus, params, x) - base:.2f} ms  "
          f"fwd+bwd {timeit(vg_fus, params, x) - base:.2f} ms")


if __name__ == "__main__":
    main()
