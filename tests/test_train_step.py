"""Sharded train-step semantics on the 8-device virtual CPU mesh.

The key parity property (SURVEY §4 plan item (c)): with ``negatives='local'``
the mesh-sharded loss equals the mean of per-shard-group computations — the
reference's per-GPU DataParallel semantics (``dpc/main.py:180,212``),
including per-replica batch-stat BN.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpc_tpu.core.config import DPCConfig, TrainConfig
from dpc_tpu.models import dpc
from dpc_tpu.ops import nce
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import optim, pretrain_step

CFG = DPCConfig(img_dim=32, num_seq=3, seq_len=4, pred_step=1)
B = 8


@pytest.fixture(scope="module")
def mesh():
    return meshlib.make_mesh()


@pytest.fixture(scope="module")
def setup(mesh):
    params = dpc.init_dpc(jax.random.PRNGKey(0), CFG)
    x = np.asarray(jax.random.normal(
        jax.random.PRNGKey(1),
        (B, CFG.num_seq, CFG.seq_len, CFG.img_dim, CFG.img_dim, 3)))
    return params, x


def _per_group_reference(params, x, n_groups, negatives="local"):
    """Host-side per-group computation mirroring DataParallel exactly."""
    bl = x.shape[0] // n_groups
    preds, gts, losses = [], [], []
    for g in range(n_groups):
        xs = jnp.asarray(x[g * bl:(g + 1) * bl])
        score, pred, gt = dpc.apply_dpc(params, xs, cfg=CFG, train=False)
        preds.append(np.asarray(pred))
        gts.append(np.asarray(gt))
        if negatives == "local":
            t = jnp.asarray(nce.nce_targets(bl, CFG.pred_step, CFG.sq))
            loss, _ = nce.nce_loss(score, t)
            losses.append(float(loss))
    if negatives == "local":
        return float(np.mean(losses))
    # global: each group's rows score against the concat of all groups' GTs
    gt_all = np.concatenate(gts, axis=0)
    cols = gt_all.reshape(-1, CFG.feature_size)
    rpg = bl * CFG.pred_step * CFG.sq
    for g in range(n_groups):
        rows = preds[g].reshape(rpg, CFG.feature_size)
        score = rows @ cols.T
        targets = g * rpg + np.arange(rpg)
        loss, _ = nce.nce_loss(jnp.asarray(score), jnp.asarray(targets))
        losses.append(float(loss))
    return float(np.mean(losses))


def test_local_negatives_match_per_group_reference(mesh, setup):
    params, x = setup
    tcfg = TrainConfig(batch_size=B, negatives="local")
    ev = pretrain_step.make_eval_step(CFG, tcfg, mesh)
    got = ev(meshlib.replicate(mesh, params), meshlib.shard_batch(mesh, x),
             jax.random.PRNGKey(0))
    want = _per_group_reference(params, x, mesh.shape["data"], "local")
    np.testing.assert_allclose(float(got["loss"]), want, rtol=1e-5,
                               atol=1e-5)


def test_global_negatives_match_per_group_reference(mesh, setup):
    params, x = setup
    tcfg = TrainConfig(batch_size=B, negatives="global")
    ev = pretrain_step.make_eval_step(CFG, tcfg, mesh)
    got = ev(meshlib.replicate(mesh, params), meshlib.shard_batch(mesh, x),
             jax.random.PRNGKey(0))
    want = _per_group_reference(params, x, mesh.shape["data"], "global")
    np.testing.assert_allclose(float(got["loss"]), want, rtol=1e-4,
                               atol=1e-4)


def test_global_pool_is_harder_than_local(mesh, setup):
    params, x = setup
    local = pretrain_step.make_eval_step(
        CFG, TrainConfig(batch_size=B, negatives="local"), mesh)(
        meshlib.replicate(mesh, params), meshlib.shard_batch(mesh, x),
        jax.random.PRNGKey(0))
    glob = pretrain_step.make_eval_step(
        CFG, TrainConfig(batch_size=B, negatives="global"), mesh)(
        meshlib.replicate(mesh, params), meshlib.shard_batch(mesh, x),
        jax.random.PRNGKey(0))
    # 8× the candidate pool ⇒ strictly larger loss at init
    assert float(glob["loss"]) > float(local["loss"])


def test_train_step_decreases_loss(mesh, setup):
    params, _ = setup
    # 16 samples → 2 per device: the local 2×2 score matrix has negatives
    x = np.asarray(jax.random.normal(
        jax.random.PRNGKey(9),
        (16, CFG.num_seq, CFG.seq_len, CFG.img_dim, CFG.img_dim, 3)))
    params = jax.tree.map(jnp.array, params)  # private copy to donate
    tcfg = TrainConfig(batch_size=16, lr=1e-3, wd=1e-5, negatives="local")
    tx = optim.pretrain_optimizer(params, tcfg.lr, tcfg.wd)
    state = pretrain_step.TrainState(params, tx.init(params),
                                     jnp.zeros((), jnp.int32))
    state = meshlib.replicate(mesh, state)
    step = pretrain_step.make_pretrain_step(CFG, tcfg, mesh, tx)
    xb = meshlib.shard_batch(mesh, jnp.asarray(x))
    losses = []
    for _ in range(6):
        state, metrics = step(state, xb, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


def test_freeze_backbone(mesh, setup):
    params, x = setup
    # snapshot before the step: donated buffers are deleted by the update
    stem_before = np.asarray(
        params["backbone"]["stem"]["conv"]["w"]).copy()
    pred_before = np.asarray(params["pred"]["conv1"]["w"]).copy()
    params = jax.tree.map(jnp.array, params)  # private copy to donate
    tcfg = TrainConfig(batch_size=B, lr=1e-2, train_what="last")
    tx = optim.pretrain_optimizer(params, tcfg.lr, tcfg.wd,
                                  train_what="last")
    state = meshlib.replicate(mesh, pretrain_step.TrainState(
        params, tx.init(params), jnp.zeros((), jnp.int32)))
    step = pretrain_step.make_pretrain_step(CFG, tcfg, mesh, tx)
    xb = meshlib.shard_batch(mesh, jnp.asarray(x))
    new_state, _ = step(state, xb, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(new_state.params["backbone"]["stem"]["conv"]["w"]),
        stem_before)
    assert not np.allclose(
        np.asarray(new_state.params["pred"]["conv1"]["w"]), pred_before)


def test_cross_replica_bn_matches_full_batch(mesh, setup):
    """--cross_replica_bn: sharded batch-stat BN must equal single-device
    BN over the full batch (the SyncBN upgrade)."""
    from jax.sharding import PartitionSpec as P

    from dpc_tpu.models import layers as L

    params, _ = L.init_batchnorm(8, track_running_stats=False), None
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (16, 4, 8)))

    def device_bn(x):
        y, _ = L.batchnorm(params[0], None, x, train=True,
                           axis_name="data")
        return y

    sharded = jax.jit(jax.shard_map(
        device_bn, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        check_vma=False))
    got = np.asarray(sharded(jnp.asarray(x)))
    want, _ = L.batchnorm(params[0], None, jnp.asarray(x), train=True)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)


def test_cross_replica_bn_ema_uses_global_count(mesh, setup):
    """SyncBN running stats: the EMA's Bessel correction must use the
    GLOBAL element count (n_dev × per-shard), so the sharded EMA equals
    the full-batch single-device EMA exactly."""
    from jax.sharding import PartitionSpec as P

    from dpc_tpu.models import layers as L

    params, state = L.init_batchnorm(8, track_running_stats=True)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (16, 4, 8)))

    def device_bn(x):
        _, new_state = L.batchnorm(params, state, x, train=True,
                                   axis_name="data")
        return new_state

    sharded = jax.jit(jax.shard_map(
        device_bn, mesh=mesh, in_specs=P("data"),
        out_specs=P(), check_vma=False))
    got = jax.tree.map(np.asarray, sharded(jnp.asarray(x)))
    _, want = L.batchnorm(params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(got["var"], np.asarray(want["var"]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got["mean"], np.asarray(want["mean"]),
                               rtol=1e-5, atol=1e-7)


def test_eval_step_fused_nce_matches_xla(mesh, setup):
    """Validation must honor the NCE impl resolution: in the capacity
    regime the unfused global score cannot be materialised, so the eval
    step routes through the flash kernel — with identical loss."""
    params, x = setup
    xb = meshlib.shard_batch(mesh, jnp.asarray(x))
    key = jax.random.PRNGKey(7)
    losses = {}
    for impl in ("xla", "fused"):
        tcfg = TrainConfig(batch_size=B, lr=1e-3, wd=1e-5,
                           negatives="global", nce_impl=impl)
        ev = pretrain_step.make_eval_step(CFG, tcfg, mesh)
        losses[impl] = float(ev(params, xb, key)["loss"])
    np.testing.assert_allclose(losses["fused"], losses["xla"], rtol=1e-5)

    # local negatives too
    for impl in ("xla", "fused"):
        tcfg = TrainConfig(batch_size=B, lr=1e-3, wd=1e-5,
                           negatives="local", nce_impl=impl)
        ev = pretrain_step.make_eval_step(CFG, tcfg, mesh)
        losses[impl] = float(ev(params, xb, key)["loss"])
    # atol: the 1-clip local pool is trivially separable (loss ≈ 0)
    np.testing.assert_allclose(losses["fused"], losses["xla"],
                               rtol=1e-5, atol=1e-5)


def test_model_parallel_requires_global_negatives(setup):
    params, x = setup
    mp_mesh = meshlib.make_mesh(8, model_parallel=2)
    tcfg = TrainConfig(batch_size=B, lr=1e-3, wd=1e-5, negatives="local")
    tx = optim.pretrain_optimizer(params, tcfg.lr, tcfg.wd)
    with pytest.raises(ValueError, match="negatives global"):
        pretrain_step.make_pretrain_step(CFG, tcfg, mp_mesh, tx)
    # the eval step must refuse the same configs the train step refuses
    # (a standalone eval-step user would otherwise hit an opaque shape
    # error pairing per-peer scores with full-local_b targets)
    with pytest.raises(ValueError, match="negatives global"):
        pretrain_step.make_eval_step(CFG, tcfg, mp_mesh)
    odd = TrainConfig(batch_size=12, negatives="global")  # local_b=3, m=2
    with pytest.raises(ValueError, match="not divisible"):
        pretrain_step.make_eval_step(CFG, odd, mp_mesh)
    with pytest.raises(ValueError, match="not divisible"):
        pretrain_step.make_pretrain_step(CFG, odd, mp_mesh, tx)


def test_fold_normalize_validated():
    """resolve_fold rejects unknown policy values instead of silently
    treating them as 'off' (same contract as resolve_nce_impl)."""
    from dpc_tpu.data import device_augment as DA
    bad = TrainConfig(device_augment=True, fold_normalize="On")
    with pytest.raises(ValueError, match="fold_normalize"):
        DA.resolve_fold(bad)
    legacy = TrainConfig(device_augment=True, fold_normalize=True)
    with pytest.raises(ValueError, match="fold_normalize"):
        DA.resolve_fold(legacy)
    assert DA.resolve_fold(
        TrainConfig(device_augment=True, fold_normalize="on")) \
        == (True, DA.INPUT_NORM_01)
    assert DA.resolve_fold(
        TrainConfig(device_augment=True, fold_normalize="auto"),
        dense_test=True) == (True, DA.INPUT_NORM_U8)
    assert DA.resolve_fold(
        TrainConfig(device_augment=False, fold_normalize="on")) \
        == (False, None)


def test_shard_key_streams():
    """The per-shard RNG contract every in-step draw (device_augment,
    dropout) relies on (``parallel/mesh.shard_key``): DISTINCT across
    'data' shards, IDENTICAL across 'model' peers (tensor-parallel
    replicas must see the same batch bytes), distinct across steps."""
    from jax.sharding import PartitionSpec as P

    m = meshlib.make_mesh(8, model_parallel=2)  # {data: 4, model: 2}

    def draw(step):
        def fn(key):
            k = meshlib.shard_key(key, step)
            return jax.random.uniform(k, (1,))
        out = jax.jit(jax.shard_map(
            fn, mesh=m, in_specs=P(),
            out_specs=P((meshlib.DATA_AXIS, meshlib.MODEL_AXIS)),
            check_vma=False))(jax.random.PRNGKey(0))
        # device grid is [data, model] row-major: row d holds peers
        # (2d, 2d+1)
        return np.asarray(out).reshape(4, 2)

    v3 = draw(jnp.uint32(3))
    np.testing.assert_array_equal(v3[:, 0], v3[:, 1])  # model peers agree
    assert len(set(v3[:, 0].tolist())) == 4            # data shards differ
    v4 = draw(jnp.uint32(4))
    assert not np.any(v3 == v4)                        # steps decorrelate


def test_model_axis_shards_clips_and_matches_data_only(setup):
    """{data:4, model:2} must compute exactly what {data:4} computes —
    the model axis shards the backbone over clips (each peer encodes its
    own B/(d·m) sub-batch, embeddings regroup for the candidate-sharded
    scoring, grads pmean over 'model' — each peer's grad already carries
    the m-duplicated full-group cotangent through the all_gather
    transpose) rather than replicating the dominant FLOPs (VERDICT r3
    weak-#3).  Dropout off: the clip split necessarily re-shapes in-step
    mask draws.  The Adam cosine check is scale-invariant, so an SGD run
    additionally pins the raw UPDATE NORM ratio — the guard that catches
    a uniform m× grad over/undercount (a psum-for-pmean bug measured
    exactly 2.000× here)."""
    cfg = DPCConfig(img_dim=32, num_seq=3, seq_len=4, pred_step=1,
                    gru_dropout=0.0)
    params = dpc.init_dpc(jax.random.PRNGKey(0), cfg)
    x = np.asarray(jax.random.normal(
        jax.random.PRNGKey(1),
        (B, cfg.num_seq, cfg.seq_len, cfg.img_dim, cfg.img_dim, 3)),
        np.float32)
    key = jax.random.PRNGKey(7)

    def run(mesh, tx=None):
        t = TrainConfig(batch_size=B, negatives="global", donate=False)
        tx = tx if tx is not None else optim.torch_adam(t.lr, t.wd)
        step = pretrain_step.make_pretrain_step(cfg, t, mesh, tx)
        state = pretrain_step.TrainState(
            params, tx.init(params), jnp.zeros((), jnp.int32))
        xb = meshlib.shard_batch(mesh, jnp.asarray(x))
        new_state, met = step(state, xb, key)
        ev = pretrain_step.make_eval_step(cfg, t, mesh)
        emet = ev(params, xb, key)
        return (jax.device_get(new_state.params),
                {k: float(v) for k, v in met.items()},
                {k: float(v) for k, v in emet.items()})

    p_mp, m_mp, e_mp = run(meshlib.make_mesh(8, model_parallel=2))
    p_dp, m_dp, e_dp = run(meshlib.make_mesh(4))

    for k in m_dp:
        np.testing.assert_allclose(m_mp[k], m_dp[k], rtol=1e-4, err_msg=k)
    for k in e_dp:
        np.testing.assert_allclose(e_mp[k], e_dp[k], rtol=1e-4, err_msg=k)
    # the two Adam updates are the same vector up to f32 reduction-order
    # noise (isolated sign flips on g≈0 elements cap elementwise claims;
    # measured: cosine 0.99999, loss Δ 2e-6 rel)
    base = jax.tree.leaves(params)
    d_mp = np.concatenate([(np.asarray(a) - np.asarray(p)).ravel()
                           for a, p in zip(jax.tree.leaves(p_mp), base)])
    d_dp = np.concatenate([(np.asarray(b) - np.asarray(p)).ravel()
                           for b, p in zip(jax.tree.leaves(p_dp), base)])
    cos = float(d_mp @ d_dp / (np.linalg.norm(d_mp) * np.linalg.norm(d_dp)))
    assert cos > 0.999, cos

    # scale-sensitive guard: one SGD(1.0) step, where update == −grad, so
    # the norm ratio directly exposes any uniform m× grad miscount
    import optax as _optax
    s_mp, _, _ = run(meshlib.make_mesh(8, model_parallel=2),
                     tx=_optax.sgd(1.0))
    s_dp, _, _ = run(meshlib.make_mesh(4), tx=_optax.sgd(1.0))
    g_mp = np.concatenate([(np.asarray(a) - np.asarray(p)).ravel()
                           for a, p in zip(jax.tree.leaves(s_mp), base)])
    g_dp = np.concatenate([(np.asarray(b) - np.asarray(p)).ravel()
                           for b, p in zip(jax.tree.leaves(s_dp), base)])
    ratio = float(np.linalg.norm(g_mp) / np.linalg.norm(g_dp))
    np.testing.assert_allclose(ratio, 1.0, rtol=1e-4)
