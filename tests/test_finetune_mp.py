"""Downstream (finetune/val/dense-test) model-axis semantics.

Round-5 counterpart of ``test_train_step.py::
test_model_axis_shards_clips_and_matches_data_only``: a mesh with a
'model' axis shards CLIPS in the LC steps too (``finetune_step.
_clip_layout``), so a pod provisioned {data x model} for pretraining runs
the downstream driver on the same mesh shape.  The pins here assert
{data:4, model:2} computes exactly what {data:4} computes — LC has no
cross-sample loss term, so unlike pretrain there is no regroup
collective to get wrong, but the BN batch-stat sync over 'model', the
peer-sliced augmentation streams, and the two-axis pmean scale are all
new surface.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dpc_tpu.core.config import DPCConfig, EvalConfig
from dpc_tpu.models import lc
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import finetune_step, optim

# gru_dropout off: clip-sharded peers hold different samples, so the
# steps deliberately decorrelate their in-step dropout draws — the
# {4,2} == {4} pins below need every stochastic mask disabled
CFG = DPCConfig(img_dim=32, num_seq=3, seq_len=4, gru_dropout=0.0)
NC = 5
B = 8


@pytest.fixture(scope="module")
def setup():
    params, bn_state = lc.init_lc(jax.random.PRNGKey(0), CFG, NC)
    x = np.asarray(jax.random.normal(
        jax.random.PRNGKey(1),
        (B, CFG.num_seq, CFG.seq_len, CFG.img_dim, CFG.img_dim, 3)),
        np.float32)
    y = np.arange(B, dtype=np.int32) % NC
    return params, bn_state, x, y


def _flat_delta(after, before):
    return np.concatenate([(np.asarray(a) - np.asarray(b)).ravel()
                           for a, b in zip(jax.tree.leaves(after),
                                           jax.tree.leaves(before))])


def _run_step(mesh, setup, ecfg, tx=None, x=None):
    params, bn_state, x0, y = setup
    x = x0 if x is None else x
    tx = tx if tx is not None else optim.finetune_optimizer(
        params, ecfg.lr, ecfg.wd, ecfg.train_what, ecfg.backbone_lr_scale)
    step = finetune_step.make_finetune_step(CFG, ecfg, mesh, tx,
                                            donate=False)
    state = finetune_step.FinetuneState(
        params, bn_state, tx.init(params), jnp.zeros((), jnp.int32))
    xb = meshlib.shard_batch(mesh, jnp.asarray(x))
    yb = meshlib.shard_batch(mesh, jnp.asarray(y))
    new_state, met = step(state, xb, yb, jax.random.PRNGKey(7),
                          jnp.float32(1.0))
    return (jax.device_get(new_state.params),
            jax.device_get(new_state.state),
            {k: float(v) for k, v in met.items()})


def test_model_axis_finetune_step_matches_data_only(setup):
    """One train step, dropout off: {4,2} == {4} — loss/top-k, the BN
    running stats (batch stats sync over 'model' so they span the data
    group — reference per-GPU semantics), and the Adam update direction.
    An SGD(1.0) run additionally pins the raw update-norm ratio, the
    guard that catches a uniform 2x grad miscount from the two-axis
    pmean."""
    ecfg = EvalConfig(num_classes=NC, dropout=0.0, batch_size=B)
    p_mp, s_mp, m_mp = _run_step(meshlib.make_mesh(8, model_parallel=2),
                                 setup, ecfg)
    p_dp, s_dp, m_dp = _run_step(meshlib.make_mesh(4), setup, ecfg)

    for k in m_dp:
        np.testing.assert_allclose(m_mp[k], m_dp[k], rtol=1e-4, err_msg=k)
    for a, b in zip(jax.tree.leaves(s_mp), jax.tree.leaves(s_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    d_mp = _flat_delta(p_mp, setup[0])
    d_dp = _flat_delta(p_dp, setup[0])
    cos = float(d_mp @ d_dp
                / (np.linalg.norm(d_mp) * np.linalg.norm(d_dp)))
    assert cos > 0.999, cos

    g_mp = _flat_delta(_run_step(meshlib.make_mesh(8, model_parallel=2),
                                 setup, ecfg, tx=optax.sgd(1.0))[0],
                       setup[0])
    g_dp = _flat_delta(_run_step(meshlib.make_mesh(4), setup, ecfg,
                                 tx=optax.sgd(1.0))[0], setup[0])
    # guard target is a uniform 2x miscount (ratio 2.0); the bf16 forward
    # reduces the differently-split batch means in a different order, so
    # allow ~1% reduction-order noise (measured 3.5e-4 on the CPU mesh)
    np.testing.assert_allclose(
        float(np.linalg.norm(g_mp) / np.linalg.norm(g_dp)), 1.0,
        rtol=1e-2)


def test_model_axis_finetune_step_device_augment(setup):
    """Same pin with the on-device finetune recipe: the peer-sliced
    per-sample key streams (``_peer_sample_keys``) must make every sample
    draw the SAME crop/flip/jitter whether its data group runs on 1 or 2
    peers, so the {4,2} and {4} losses agree exactly (dropout off)."""
    params, bn_state, _, y = setup
    rng = np.random.default_rng(3)
    win = rng.integers(0, 256, (B, CFG.num_seq, CFG.seq_len, 40, 40, 3),
                       dtype=np.uint8)
    ecfg = EvalConfig(num_classes=NC, dropout=0.0, batch_size=B,
                      device_augment=True)
    _, s_mp, m_mp = _run_step(meshlib.make_mesh(8, model_parallel=2),
                              setup, ecfg, x=win)
    _, s_dp, m_dp = _run_step(meshlib.make_mesh(4), setup, ecfg, x=win)
    for k in m_dp:
        np.testing.assert_allclose(m_mp[k], m_dp[k], rtol=1e-4, err_msg=k)
    for a, b in zip(jax.tree.leaves(s_mp), jax.tree.leaves(s_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_model_axis_eval_step_matches_data_only(setup):
    """Eval-mode forward (running BN stats, no dropout) is purely
    per-sample, so the clip split is exact."""
    params, bn_state, x, y = setup
    ecfg = EvalConfig(num_classes=NC, dropout=0.0, batch_size=B)

    def run(mesh):
        ev = finetune_step.make_finetune_eval_step(CFG, ecfg, mesh)
        met = ev(params, bn_state,
                 meshlib.shard_batch(mesh, jnp.asarray(x)),
                 meshlib.shard_batch(mesh, jnp.asarray(y)),
                 jax.random.PRNGKey(5))
        return {k: float(v) for k, v in met.items()}

    m_mp = run(meshlib.make_mesh(8, model_parallel=2))
    m_dp = run(meshlib.make_mesh(4))
    for k in m_dp:
        np.testing.assert_allclose(m_mp[k], m_dp[k], rtol=1e-4, err_msg=k)


def test_model_axis_dense_test_forward_row_order(setup):
    """The sharded dense-test forward on {4,2} returns the same logits in
    the same ROW ORDER as the unsharded jitted forward — the combined
    P(('data','model')) spec splits the leading axis row-major over the
    device grid, so the caller's per-video window accounting needs no
    change."""
    params, bn_state, _, _ = setup
    rng = np.random.default_rng(4)
    wb = 8
    win = rng.integers(0, 256,
                       (wb, CFG.num_seq, CFG.seq_len, 36, 36, 3),
                       dtype=np.uint8)
    ecfg = EvalConfig(num_classes=NC, dropout=0.0, batch_size=B,
                      device_augment=True)
    ref = finetune_step.make_test_forward(CFG, ecfg, test_crop=36)(
        params, bn_state, jnp.asarray(win))
    fwd = finetune_step.make_test_forward_sharded(
        CFG, ecfg, meshlib.make_mesh(8, model_parallel=2), test_crop=36)
    got = fwd(params, bn_state, jnp.asarray(win))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_model_axis_batch_divisibility_guard():
    """per-data-group batch not divisible by the model axis -> clear
    error at step-build time, not a shard_map shape crash mid-run."""
    ecfg = EvalConfig(num_classes=NC, batch_size=4)  # 4/(2 data) = 2, %4
    mesh = meshlib.make_mesh(8, model_parallel=4)    # {data:2, model:4}
    tx = optax.sgd(1.0)
    with pytest.raises(ValueError, match="model_parallel"):
        finetune_step.make_finetune_step(CFG, ecfg, mesh, tx)
