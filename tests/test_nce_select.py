"""NCE implementation auto-selection + fused-backward dispatch.

Round-1 VERDICT item 8: nothing auto-selected the NCE kernel and the flash
backward recomputed the score twice.  These tests pin (a) the selection
rule (XLA when the score fits HBM, fused in the capacity regime), (b) the
driver-level resolution including the deprecated ``fused_nce`` alias, and
(c) gradient equality of BOTH Pallas backward paths (single-sweep fused
and the two-sweep fallback) against the XLA reference.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from dpc_tpu.core.config import DPCConfig, TrainConfig
from dpc_tpu.ops import nce, nce_pallas
from dpc_tpu.train import pretrain_step

GIB = 2**30


def test_pick_small_score_uses_xla():
    # R18-128 local negatives, batch 64: R = C = 64*3*16 = 3072
    assert nce.pick_nce_impl(3072, 3072, hbm_bytes=16 * GIB) == "xla"


def test_pick_measured_regime_uses_xla():
    # largest shape measured faster on the XLA path (docs/RESULTS.md)
    assert nce.pick_nce_impl(2156, 49152, hbm_bytes=16 * GIB) == "xla"


def test_pick_capacity_regime_uses_fused():
    # v5e-64-scale global negatives (R34-224, global batch 2816):
    # C = 2816*3*49 ≈ 414k ⇒ 2·R·C·4 ≈ 7 GiB of score > 2 GiB budget
    assert nce.pick_nce_impl(6468, 413952, hbm_bytes=16 * GIB) == "fused"


def test_pick_threshold_is_the_budget_fraction():
    # 2*4*R*C == frac*hbm exactly at the boundary ⇒ still XLA (strict >)
    assert nce.pick_nce_impl(1024, 256, hbm_bytes=2 * 4 * 1024 * 256 * 8,
                             budget_frac=0.125) == "xla"
    assert nce.pick_nce_impl(1024, 257, hbm_bytes=2 * 4 * 1024 * 256 * 8,
                             budget_frac=0.125) == "fused"


def test_resolve_forced_and_deprecated_alias():
    m = DPCConfig()
    assert pretrain_step.resolve_nce_impl(
        TrainConfig(batch_size=8, nce_impl="xla"), m, 1) == "xla"
    assert pretrain_step.resolve_nce_impl(
        TrainConfig(batch_size=8, nce_impl="fused"), m, 1) == "fused"
    assert pretrain_step.resolve_nce_impl(
        TrainConfig(batch_size=8, fused_nce=True), m, 1) == "fused"


def test_resolve_auto_counts_global_pool():
    # global negatives widen C by the data-axis size: the same local batch
    # can cross the threshold only through n_data
    m = DPCConfig(img_dim=224, network="resnet34")  # sq = 49
    local = TrainConfig(batch_size=2816, negatives="local")
    glob = TrainConfig(batch_size=2816, negatives="global")
    n_data = 64  # local R = 44·3·49 = 6468; global C = 64× that
    assert pretrain_step.resolve_nce_impl(local, m, n_data) == "xla"
    assert pretrain_step.resolve_nce_impl(glob, m, n_data) == "fused"


def _grad_data(r=24, c=96, d=32, seed=7):
    rng = np.random.default_rng(seed)
    rows = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))
    cols = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, c, size=r).astype(np.int32))
    return rows, cols, targets


def _ref_grads(rows, cols, targets):
    def loss(rows, cols):
        score = rows @ cols.T
        lse = jax.nn.logsumexp(score, axis=-1)
        pos = jnp.take_along_axis(score, targets[:, None], -1)[:, 0]
        return jnp.mean(lse - pos)
    return jax.grad(loss, argnums=(0, 1))(rows, cols)


def _pallas_grads(rows, cols, targets):
    def loss(rows, cols):
        lse, pos, _ = nce_pallas.nce_lse_rank(rows, cols, targets, 8, 32,
                                              (1, 3, 5))
        return jnp.mean(lse - pos)
    return jax.grad(loss, argnums=(0, 1))(rows, cols)


def test_fused_backward_path_matches_xla():
    rows, cols, targets = _grad_data()
    assert nce_pallas._fused_bwd_c_tile(24, 32, 32) is not None
    got = _pallas_grads(rows, cols, targets)
    want = _ref_grads(rows, cols, targets)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_two_sweep_fallback_matches_xla(monkeypatch):
    rows, cols, targets = _grad_data(seed=8)
    monkeypatch.setattr(nce_pallas, "_FUSED_BWD_VMEM_BUDGET", 0)
    assert nce_pallas._fused_bwd_c_tile(24, 32, 32) is None
    got = _pallas_grads(rows, cols, targets)
    want = _ref_grads(rows, cols, targets)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fused_backward_non_divisible_rows_and_cols():
    # r=13 (not sublane-aligned), c=50 (not a tile multiple)
    rows, cols, targets = _grad_data(r=13, c=50, d=16, seed=9)
    got = _pallas_grads(rows, cols, targets)
    want = _ref_grads(rows, cols, targets)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
