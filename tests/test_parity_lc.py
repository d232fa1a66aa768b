"""Golden parity: LC classifier (finetune/probe model) vs the reference."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

import ref_harness as ref
from dpc_tpu.core.config import DPCConfig
from dpc_tpu.models import lc
from dpc_tpu.utils import torch_compat as tc


def test_lc_forward_parity():
    cfg = DPCConfig(img_dim=64, num_seq=4, seq_len=5)
    num_classes = 11
    tmodel = ref.ref_lc(cfg.img_dim, cfg.num_seq, cfg.seq_len,
                        cfg.network, num_classes)
    params, state = lc.init_lc(jax.random.PRNGKey(0), cfg, num_classes)
    params = ref.load_into_jax(tmodel, params, tc.lc_key_map(params))
    state = ref.load_into_jax(tmodel, state, tc.lc_state_key_map(state),
                              expect="state")

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, cfg.num_seq, cfg.seq_len, 64, 64, 3)
                   ).astype(np.float32)
    with torch.no_grad():
        tlogits, tcontext = tmodel(ref.to_torch_video(x))
    jlogits, jcontext, _ = lc.apply_lc(params, state, jnp.asarray(x),
                                       cfg=cfg, num_classes=num_classes,
                                       train=False)
    np.testing.assert_allclose(np.asarray(jlogits), tlogits.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jcontext), tcontext.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_lc_context_is_post_bn_with_trained_stats():
    """The returned context must be POST-final_bn like the reference
    (eval/model_3d_lc.py:62-64).  A fresh BN is ~identity in eval mode,
    so this only bites with TRAINED running stats — pin it with
    non-trivial stats and affine, where pre- and post-BN features differ
    by the full BN transform."""
    cfg = DPCConfig(img_dim=64, num_seq=4, seq_len=5)
    num_classes = 7
    tmodel = ref.ref_lc(cfg.img_dim, cfg.num_seq, cfg.seq_len,
                        cfg.network, num_classes)
    with torch.no_grad():
        bn = tmodel.final_bn
        d = bn.num_features
        bn.running_mean.copy_(torch.linspace(-1.0, 1.0, d))
        bn.running_var.copy_(torch.linspace(0.5, 2.0, d))
        bn.weight.copy_(torch.linspace(0.8, 1.2, d))
        bn.bias.copy_(torch.linspace(-0.2, 0.2, d))
    params, state = lc.init_lc(jax.random.PRNGKey(0), cfg, num_classes)
    params = ref.load_into_jax(tmodel, params, tc.lc_key_map(params))
    state = ref.load_into_jax(tmodel, state, tc.lc_state_key_map(state),
                              expect="state")

    x = np.random.default_rng(3).normal(
        size=(2, cfg.num_seq, cfg.seq_len, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        tlogits, tcontext = tmodel(ref.to_torch_video(x))
    jlogits, jcontext, _ = lc.apply_lc(params, state, jnp.asarray(x),
                                       cfg=cfg, num_classes=num_classes,
                                       train=False)
    np.testing.assert_allclose(np.asarray(jlogits), tlogits.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jcontext), tcontext.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_lc_transfer_from_dpc():
    """DPC-pretrain → LC transfer: backbone+agg weights carry over, head
    stays fresh (the neq_load_customized workflow)."""
    from dpc_tpu.core import checkpoint as ckpt
    from dpc_tpu.models import dpc as dpc_mod

    cfg = DPCConfig(img_dim=64, num_seq=4, seq_len=5, pred_step=2)
    dpc_params = dpc_mod.init_dpc(jax.random.PRNGKey(1), cfg)
    lc_params, _ = lc.init_lc(jax.random.PRNGKey(2), cfg, num_classes=5)
    before_fc = np.asarray(lc_params["final_fc"]["w"]).copy()
    lc_params = ckpt.transfer_load(lc_params, dpc_params, verbose=False)
    # trunk transferred
    np.testing.assert_array_equal(
        np.asarray(lc_params["backbone"]["stem"]["conv"]["w"]),
        np.asarray(dpc_params["backbone"]["stem"]["conv"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(lc_params["agg"]["cells"][0]["out"]["w"]),
        np.asarray(dpc_params["agg"]["cells"][0]["out"]["w"]))
    # head untouched
    np.testing.assert_array_equal(
        np.asarray(lc_params["final_fc"]["w"]), before_fc)


def test_lc_train_mode_updates_bn_state():
    cfg = DPCConfig(img_dim=64, num_seq=2, seq_len=5)
    params, state = lc.init_lc(jax.random.PRNGKey(0), cfg, num_classes=5)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 2, 5, 64, 64, 3)).astype(np.float32))
    _, _, new_state = lc.apply_lc(params, state, x, cfg=cfg, num_classes=5,
                                  train=True, key=jax.random.PRNGKey(3))
    # running stats must move in train mode...
    assert not np.allclose(
        np.asarray(new_state["backbone"]["stem"]["bn"]["mean"]),
        np.asarray(state["backbone"]["stem"]["bn"]["mean"]))
    # ...and stay fixed in eval mode
    _, _, eval_state = lc.apply_lc(params, state, x, cfg=cfg, num_classes=5,
                                   train=False)
    np.testing.assert_array_equal(
        np.asarray(eval_state["backbone"]["stem"]["bn"]["mean"]),
        np.asarray(state["backbone"]["stem"]["bn"]["mean"]))


def test_extract_context_matches_lc_trunk():
    """extract_context(order='lc') on a DPC tree must equal the LC model's
    pre-head context when the trunk weights are shared."""
    import jax.numpy as jnp
    from dpc_tpu.core import checkpoint as ckpt
    from dpc_tpu.models import dpc as dpc_mod

    cfg = DPCConfig(img_dim=64, num_seq=3, seq_len=5)
    dpc_params = dpc_mod.init_dpc(jax.random.PRNGKey(0), cfg)
    lc_params, lc_state = lc.init_lc(jax.random.PRNGKey(1), cfg, 5)
    lc_params = ckpt.transfer_load(lc_params, dpc_params, verbose=False)

    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 3, 5, 64, 64, 3)).astype(np.float32))
    ctx = dpc_mod.extract_context(dpc_params, x, cfg=cfg, order="lc")
    ctx_pooled = np.asarray(ctx).mean(axis=(1, 2))
    # LC's returned context is POST-final_bn (reference semantics, see
    # test_lc_context_is_post_bn_with_trained_stats), so push the pooled
    # trunk context through the same BN before comparing.  The DPC tree
    # has no running stats (batch-stat BN), so compare against LC in
    # train mode (batch stats too), dropout off (no key).
    from dpc_tpu.models import layers as L
    expected, _ = L.batchnorm(lc_params["final_bn"], lc_state["final_bn"],
                              jnp.asarray(ctx_pooled), train=True)
    _, lc_ctx, _ = lc.apply_lc(lc_params, lc_state, x, cfg=cfg,
                               num_classes=5, train=True, key=None)
    np.testing.assert_allclose(np.asarray(expected),
                               np.asarray(lc_ctx)[:, 0],
                               rtol=1e-4, atol=1e-5)
