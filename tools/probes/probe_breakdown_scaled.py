"""Stage-prefix breakdown of a scaled config's step (VERDICT r4 #3 lever
pass): where do the ms go at R34-224 / R34-128-ns10-pred5?

Same protocol as ``dpc_tpu/train/bench_breakdown.py`` (scalar fetch,
read the DELTAS between cumulative prefixes) but parameterized over the
config so the scaled headline rows can be accounted the way R18-128 b64
was in rounds 2-3.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_breakdown_scaled.py resnet34 224 8 3 16
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_breakdown_scaled.py resnet34 128 10 5 32
"""
import sys
import time

import jax
import jax.numpy as jnp

from dpc_tpu.core.config import DPCConfig, dtype_of
from dpc_tpu.models import dpc, layers as L, resnet2d3d
from dpc_tpu.train.bench_breakdown import scalarize

ITERS = 10


def timeit(fn, *args) -> float:
    s = fn(*args); float(s)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s = fn(*args)
        float(s)
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    return best


def main(net: str, img: int, num_seq: int, pred: int, batch: int) -> None:
    cfg = DPCConfig(network=net, img_dim=img, num_seq=num_seq,
                    pred_step=pred, compute_dtype="bfloat16")
    dtype = dtype_of(cfg.compute_dtype)
    params = dpc.init_dpc(jax.random.PRNGKey(0), cfg)
    specs = resnet2d3d._block_specs(cfg.network)
    clips = batch * cfg.num_seq
    x_clips = jax.random.normal(
        jax.random.PRNGKey(1),
        (clips, cfg.seq_len, img, img, 3), jnp.bfloat16)

    def backbone_prefix(n_stages: int):
        def f(p, x):
            # the PRODUCTION stem path (fused conv→BN→ReLU→pool), not the
            # naive op sequence — the naive stem measured 65.9 ms fwd+bwd
            # at 224² where the whole production step is 142.3 ms
            h, _ = L.fused_stem(p["stem"]["conv"], p["stem"]["bn"], x,
                                state=None, train=True, dtype=dtype,
                                axis_name=None)
            for si in range(n_stages):
                for bi, spec in enumerate(specs[si]):
                    h, _ = resnet2d3d._apply_block(
                        p[f"layer{si+1}"][bi], None, spec, h,
                        train=True, dtype=dtype, axis_name=None)
            return h
        return f

    bp = params["backbone"]
    for n_stages, name in ((0, "stem+pool"), (1, "thru_l1"), (2, "thru_l2"),
                           (3, "thru_l3"), (4, "backbone")):
        f = backbone_prefix(n_stages)
        g = jax.grad(lambda p, x: jnp.sum(f(p, x).astype(jnp.float32)))
        fwd = timeit(scalarize(f), bp, x_clips)
        fb = timeit(scalarize(g), bp, x_clips)
        print(f"{name:>10}: fwd {fwd:7.2f} ms   fwd+bwd {fb:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "resnet34",
         int(a[1]) if len(a) > 1 else 224,
         int(a[2]) if len(a) > 2 else 8,
         int(a[3]) if len(a) > 3 else 3,
         int(a[4]) if len(a) > 4 else 16)
