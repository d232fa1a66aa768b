"""Golden parity: full DPC forward (score matrix + loss) vs the reference
model with identical weights — the BASELINE 'bit-for-bit loss/feature
fidelity' check, run at CPU float32 tolerance."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

import ref_harness as ref
from dpc_tpu.core.config import DPCConfig
from dpc_tpu.models import dpc
from dpc_tpu.ops import nce
from dpc_tpu.utils import torch_compat as tc


def _paired_models(cfg: DPCConfig):
    tmodel = ref.ref_dpc(cfg.img_dim, cfg.num_seq, cfg.seq_len,
                         cfg.pred_step, cfg.network)
    params = dpc.init_dpc(jax.random.PRNGKey(0), cfg)
    params = ref.load_into_jax(tmodel, params, tc.dpc_key_map(params))
    return tmodel, params


def test_dpc_forward_and_loss_parity():
    cfg = DPCConfig(img_dim=64, num_seq=5, seq_len=5, pred_step=3,
                    network="resnet18")
    tmodel, params = _paired_models(cfg)
    B = 2
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, cfg.num_seq, cfg.seq_len,
                         cfg.img_dim, cfg.img_dim, 3)).astype(np.float32)

    with torch.no_grad():
        tscore, tmask = tmodel(ref.to_torch_video(x))
    jscore, jpred, jgt = dpc.apply_dpc(params, jnp.asarray(x), cfg=cfg,
                                       train=False)

    R = B * cfg.pred_step * cfg.sq
    np.testing.assert_allclose(np.asarray(jscore),
                               tscore.numpy().reshape(R, R),
                               rtol=1e-3, atol=1e-3)

    # mask parity against the reference's cached module mask
    ours_mask = nce.nce_mask(B, cfg.pred_step, cfg.sq)
    np.testing.assert_array_equal(ours_mask, tmask.numpy())

    # loss parity against the reference driver computation (dpc/main.py:209-217)
    target = (tmask == 1)
    tflat = target.reshape(R, R).to(torch.int64).argmax(dim=1)
    ref_loss = torch.nn.functional.cross_entropy(
        tscore.reshape(R, R), tflat)
    jloss, _ = nce.nce_loss(jscore, jnp.asarray(nce.nce_targets(
        B, cfg.pred_step, cfg.sq)))
    np.testing.assert_allclose(float(jloss), float(ref_loss),
                               rtol=1e-4, atol=1e-4)


def test_dpc_gt_is_preactivation_and_pred_unrelu():
    cfg = DPCConfig(img_dim=64, num_seq=4, seq_len=5, pred_step=2)
    _, params = _paired_models(cfg)
    x = np.random.default_rng(1).normal(
        size=(1, 4, 5, 64, 64, 3)).astype(np.float32)
    _, pred, gt = dpc.apply_dpc(params, jnp.asarray(x), cfg=cfg, train=False)
    # the pre-ReLU trick (dpc/model_3d.py:55-58): both sides span (−inf, +inf)
    assert (np.asarray(gt) < 0).any()
    assert (np.asarray(pred) < 0).any()


def test_dpc_train_mode_runs_with_dropout():
    cfg = DPCConfig(img_dim=64, num_seq=4, seq_len=5, pred_step=2)
    params = dpc.init_dpc(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 4, 5, 64, 64, 3)).astype(np.float32))
    s1, _, _ = dpc.apply_dpc(params, x, cfg=cfg, train=True,
                             key=jax.random.PRNGKey(1))
    s2, _, _ = dpc.apply_dpc(params, x, cfg=cfg, train=True,
                             key=jax.random.PRNGKey(2))
    # different dropout draws ⇒ different scores
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_dpc_with_bottleneck_backbone():
    """resnet50-based DPC: feature_size 1024 flows through GRU/predictor/
    score (the wider-trunk config family)."""
    cfg = DPCConfig(img_dim=32, num_seq=3, seq_len=4, pred_step=1,
                    network="resnet50")
    assert cfg.feature_size == 1024
    params = dpc.init_dpc(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 3, 4, 32, 32, 3)).astype(np.float32))
    score, pred, gt = dpc.apply_dpc(params, x, cfg=cfg, train=False)
    assert score.shape == (1, 1)
    assert pred.shape == (1, 1, 1, 1, 1024)


def test_dpc_with_two_layer_gru():
    cfg = DPCConfig(img_dim=32, num_seq=4, seq_len=4, pred_step=2,
                    gru_num_layers=2)
    params = dpc.init_dpc(jax.random.PRNGKey(0), cfg)
    assert len(params["agg"]["cells"]) == 2
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 4, 4, 32, 32, 3)).astype(np.float32))
    score, _, _ = dpc.apply_dpc(params, x, cfg=cfg, train=True,
                                key=jax.random.PRNGKey(2))
    assert score.shape == (4, 4)
    assert np.isfinite(np.asarray(score)).all()
