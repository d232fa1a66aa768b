"""Component-level timing breakdown of the DPC train step on the real chip.

Times each piece of the R18-128 batch-64 step (the bench.py config) in
isolation — backbone stages, head (GRU + rollout + NCE), full step — each as
fwd-only and fwd+bwd, so the HBM-bound hot spots can be attacked with
evidence rather than guesswork (VERDICT round-1 item: "profile-driven perf
push").  Usage:

    PYTHONPATH=/root/repo:/root/.axon_site python -m dpc_tpu.train.bench_breakdown
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from dpc_tpu.core.config import DPCConfig, TrainConfig, dtype_of
from dpc_tpu.models import dpc, layers as L, resnet2d3d
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import optim, pretrain_step

BATCH = 64
ITERS = 20


def scalarize(fn):
    """Reduce a fn's output pytree to one scalar inside the jit.

    Timing MUST fetch a scalar: on the remote (axon-tunnelled) backend,
    ``block_until_ready`` on a large device array can return before the
    computation drains (measured 0.3 ms for a 197-GFLOP conv), while a
    scalar fetch gives numbers consistent with the end-to-end step.
    """
    def wrapped(*args):
        out = fn(*args)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(out))
    return jax.jit(wrapped)


def timeit(fn, *args) -> float:
    s = fn(*args)
    float(s)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s = fn(*args)
    float(s)
    return (time.perf_counter() - t0) / ITERS * 1e3  # ms


def main() -> None:
    # match bench.py's stock-flag kernel choices (scan GRU, auto NCE) so
    # full_step here is the same program the headline number times
    cfg = DPCConfig(compute_dtype="bfloat16")
    dtype = dtype_of(cfg.compute_dtype)
    key = jax.random.PRNGKey(0)
    params = dpc.init_dpc(key, cfg)
    specs = resnet2d3d._block_specs(cfg.network)

    clips = BATCH * cfg.num_seq
    x_clips = jax.random.normal(
        jax.random.PRNGKey(1),
        (clips, cfg.seq_len, cfg.img_dim, cfg.img_dim, 3), jnp.float32)
    x_batch = x_clips.reshape(BATCH, cfg.num_seq, cfg.seq_len,
                              cfg.img_dim, cfg.img_dim, 3)

    results: dict[str, float] = {}

    # ---- full train step (bench.py reference point) ----
    # donate=False (unlike bench.py): timeit re-feeds the SAME state
    # every iteration, so its buffers must survive the call
    tcfg = TrainConfig(batch_size=BATCH, lr=1e-3, wd=1e-5,
                       negatives="local", donate=False)
    mesh = meshlib.make_mesh(1)
    tx = optim.pretrain_optimizer(params, tcfg.lr, tcfg.wd)
    state = meshlib.replicate(mesh, pretrain_step.TrainState(
        params, tx.init(params), jnp.zeros((), jnp.int32)))
    step = pretrain_step.make_pretrain_step(cfg, tcfg, mesh, tx)
    xb = meshlib.shard_batch(mesh, x_batch)
    k2 = jax.random.PRNGKey(2)
    # scalarize the FULL (state, metrics) output: summing only the
    # metrics would leave the new TrainState unconsumed, and XLA then
    # dead-code-eliminates the entire backward + Adam update — "full
    # step" silently times forward-only (the params/opt reduction this
    # adds is noise next to the step itself)
    results["full_step"] = timeit(
        scalarize(lambda s, x, k: step(s, x, k)), state, xb, k2)

    # ---- stage-cumulative backbone slices ----
    def backbone_prefix(n_stages: int):
        def f(p, x):
            # the PRODUCTION stem path (fused conv→BN→ReLU→pool, what
            # apply_resnet2d3d's 'auto' resolves to on TPU) — the naive
            # op sequence would over-attribute time to the stem
            # (tools/probes/probe_breakdown_scaled.py measured the
            # naive stem at 65.9 ms fwd+bwd where the whole 224² step
            # is 142.3 ms)
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
        results[f"{name}_fwd"] = timeit(scalarize(f), bp, x_clips)
        g = jax.grad(lambda p, x: jnp.sum(f(p, x).astype(jnp.float32)))
        results[f"{name}_fwdbwd"] = timeit(scalarize(g), bp, x_clips)

    # stem conv alone (no BN/pool)
    stem = scalarize(lambda p, x: L.conv3d(p, x, (1, 2, 2), (0, 3, 3), dtype))
    results["stem_conv_fwd"] = timeit(stem, bp["stem"]["conv"], x_clips)

    # ---- head: GRU + rollout + NCE from precomputed features ----
    feats = jax.jit(lambda p, x: dpc.encode_blocks(
        p, x, cfg=cfg, train=True, dtype=dtype))(params, x_batch)
    jax.block_until_ready(feats)

    from dpc_tpu.ops import nce
    targets = jnp.asarray(nce.nce_targets(BATCH, cfg.pred_step, cfg.sq))

    def head_loss(p, feature_pre, k):
        gt = feature_pre[:, cfg.num_seq - cfg.pred_step:]
        feature = jax.nn.relu(feature_pre)
        from dpc_tpu.models import convgru
        kgru, kroll = jax.random.split(k)
        _, last = convgru.apply_convgru(
            p["agg"], feature[:, :cfg.num_seq - cfg.pred_step],
            kernel_size=cfg.gru_kernel_size, dropout=cfg.gru_dropout,
            train=True, key=kgru, dtype=dtype, impl=cfg.gru_impl)
        hidden = [last[:, li] for li in range(cfg.gru_num_layers)]

        def rollout_step(carry, i):
            hid = carry
            pr = dpc._predictor(p["pred"], hid[-1], dtype=dtype)
            hid = convgru.convgru_single_step(
                p["agg"], jax.nn.relu(pr), hid,
                kernel_size=cfg.gru_kernel_size, dropout=cfg.gru_dropout,
                train=True, key=jax.random.fold_in(kroll, i), dtype=dtype)
            return hid, pr

        _, preds = jax.lax.scan(rollout_step, hidden,
                                jnp.arange(cfg.pred_step, dtype=jnp.uint32))
        pred = jnp.moveaxis(preds, 0, 1)
        score = nce.dense_score(pred.astype(jnp.float32),
                                gt.astype(jnp.float32))
        loss, _ = nce.nce_loss(score, targets)
        return loss

    k3 = jax.random.PRNGKey(3)
    results["head_fwd"] = timeit(scalarize(head_loss), params, feats, k3)
    results["head_fwdbwd"] = timeit(
        scalarize(jax.grad(head_loss, argnums=(0, 1))), params, feats, k3)

    # ---- loss fwd only through everything (no grads, no optimizer) ----
    def full_fwd(p, x, k):
        score, pred, gt = dpc.apply_dpc(p, x, cfg=cfg, train=True, key=k,
                                        dtype=dtype)
        loss, _ = nce.nce_loss(score, targets)
        return loss
    results["model_fwd"] = timeit(scalarize(full_fwd), params, x_batch, k3)
    results["model_fwdbwd"] = timeit(
        scalarize(jax.grad(full_fwd)), params, x_batch, k3)

    for k, v in results.items():
        print(f"{k:>20}: {v:8.2f} ms")
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
