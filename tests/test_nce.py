"""Dense-NCE mask/target/loss tests, including golden parity with the
reference's loop-built mask and driver-side loss (dpc/model_3d.py:86-96,
dpc/main.py:178-217)."""

import numpy as np
import pytest

from dpc_tpu.ops import nce


def _reference_mask(B, P, SQ):
    """The reference's mask, built with its torch loop algorithm."""
    import torch

    mask = torch.zeros((B, P, SQ, B, P, SQ), dtype=torch.int8)
    mask[torch.arange(B), :, :, torch.arange(B), :, :] = -3
    for k in range(B):
        mask[k, :, torch.arange(SQ), k, :, torch.arange(SQ)] = -1
    tmp = mask.permute(0, 2, 1, 3, 5, 4).contiguous().view(
        B * SQ, P, B * SQ, P)
    for j in range(B * SQ):
        tmp[j, torch.arange(P), j, torch.arange(P)] = 1
    mask = tmp.view(B, SQ, P, B, SQ, P).permute(0, 2, 1, 3, 5, 4)
    return mask.numpy()


@pytest.mark.parametrize("B,P,SQ", [(4, 3, 16), (2, 2, 4), (1, 3, 49)])
def test_mask_matches_reference_construction(B, P, SQ):
    ours = nce.nce_mask(B, P, SQ)
    ref = _reference_mask(B, P, SQ)
    np.testing.assert_array_equal(ours, ref)


def test_mask_code_counts():
    B, P, SQ = 4, 3, 16
    m = nce.nce_mask(B, P, SQ)
    n_pos = int((m == 1).sum())
    n_temporal = int((m == -1).sum())
    n_spatial = int((m == -3).sum())
    n_easy = int((m == 0).sum())
    assert n_pos == B * P * SQ                        # one positive per row
    assert n_temporal == B * SQ * P * (P - 1)         # same cell, wrong step
    assert n_spatial == B * P * SQ * P * SQ - n_pos - n_temporal
    assert n_easy == (B * P * SQ) ** 2 - n_pos - n_temporal - n_spatial


def test_targets_are_mask_argmax():
    B, P, SQ = 3, 2, 9
    m = nce.nce_mask(B, P, SQ)
    R = B * P * SQ
    ref_targets = (m.reshape(R, R) == 1).argmax(axis=1)
    np.testing.assert_array_equal(nce.nce_targets(B, P, SQ), ref_targets)


def test_nce_loss_matches_torch_cross_entropy():
    import torch

    rng = np.random.default_rng(0)
    B, P, SQ = 2, 3, 16
    R = B * P * SQ
    score = rng.normal(size=(R, R)).astype(np.float32)
    targets = nce.nce_targets(B, P, SQ)

    loss, metrics = nce.nce_loss(score, targets)
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(score), torch.from_numpy(targets.astype(np.int64)))
    assert abs(float(loss) - float(ref)) < 1e-5

    # top-k parity with the reference's calc_topk_accuracy (utils/utils.py:38)
    ts = torch.from_numpy(score)
    tt = torch.from_numpy(targets.astype(np.int64))
    _, pred = ts.topk(5, 1, True, True)
    correct = pred.t().eq(tt.view(1, -1))
    for k in (1, 3, 5):
        ref_acc = correct[:k].reshape(-1).float().sum(0).item() / R
        assert abs(float(metrics[f"top{k}"]) - ref_acc) < 1e-6


def test_dense_score_matches_einsum():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    B, P, S, D = 2, 3, 4, 8
    pred = rng.normal(size=(B, P, S, S, D)).astype(np.float32)
    gt = rng.normal(size=(B, P, S, S, D)).astype(np.float32)
    score = nce.dense_score(jnp.asarray(pred), jnp.asarray(gt))
    ref = np.einsum("bpxyd,cqzwd->bpxycqzw", pred, gt).reshape(
        B * P * S * S, B * P * S * S)
    np.testing.assert_allclose(np.asarray(score), ref, rtol=1e-5, atol=1e-5)
