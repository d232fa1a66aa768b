"""Golden parity: 2d3d-ResNet backbone vs the reference PyTorch model,
identical weights, identical inputs (SURVEY §4 plan item (b))."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_harness as ref
from dpc_tpu.models import resnet2d3d
from dpc_tpu.utils import torch_compat as tc


def _run_pair(network: str, track: bool, shape=(2, 5, 64, 64)):
    """shape = (B, T, H, W)."""
    b, t, h, w = shape
    tmodel = ref.ref_resnet(network, track_running_stats=track)
    params, state = resnet2d3d.init_resnet2d3d(
        jax.random.PRNGKey(0), network, track_running_stats=track)
    params = ref.load_into_jax(
        tmodel, params, tc._backbone_key_map(params))
    if track:
        state = ref.load_into_jax(
            tmodel, state, tc._backbone_state_key_map(state), expect="state")

    rng = np.random.default_rng(42)
    x = rng.normal(size=(b, t, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        ty = tmodel(torch.from_numpy(
            np.ascontiguousarray(np.transpose(x, (0, 4, 1, 2, 3)))))
    jy, _ = resnet2d3d.apply_resnet2d3d(
        params, state, jnp.asarray(x), network=network, train=False)
    ty = np.transpose(ty.numpy(), (0, 2, 3, 4, 1))  # NCDHW -> NDHWC
    return np.asarray(jy), ty


@pytest.mark.parametrize("network", ["resnet18", "resnet34"])
def test_backbone_parity_batchstats(network):
    # track_running_stats=False: BN uses batch stats even in eval —
    # the DPC-pretrain semantics (dpc/model_3d.py:28).
    jy, ty = _run_pair(network, track=False)
    assert jy.shape == ty.shape
    np.testing.assert_allclose(jy, ty, rtol=1e-3, atol=5e-4)


def test_backbone_parity_running_stats():
    # track_running_stats=True + eval: running stats (LC semantics).
    jy, ty = _run_pair("resnet18", track=True)
    np.testing.assert_allclose(jy, ty, rtol=1e-3, atol=1e-4)


def test_backbone_parity_bottleneck_float64():
    """resnet50 drifts visibly in f32 (53 chained batch-stat BNs amplify
    conv-algorithm FP noise ~4× per stage); in f64 the drift vanishes,
    proving the semantics are exact."""
    with jax.enable_x64(True):
        network = "resnet50"
        tmodel = ref.ref_resnet(network, track_running_stats=False).double()
        params, _ = resnet2d3d.init_resnet2d3d(
            jax.random.PRNGKey(0), network, track_running_stats=False)
        params = ref.load_into_jax(tmodel, params,
                                   tc._backbone_key_map(params))
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params)
        rng = np.random.default_rng(42)
        x = rng.normal(size=(1, 5, 64, 64, 3))
        with torch.no_grad():
            ty = tmodel(torch.from_numpy(np.ascontiguousarray(
                np.transpose(x, (0, 4, 1, 2, 3)))))
        jy, _ = resnet2d3d.apply_resnet2d3d(
            params, None, jnp.asarray(x, jnp.float64), network=network,
            train=False)
        np.testing.assert_allclose(
            np.asarray(jy), np.transpose(ty.numpy(), (0, 2, 3, 4, 1)),
            rtol=1e-9, atol=1e-9)


def test_backbone_output_shape():
    # 128² / 5 frames -> 4×4 grid, 2 time steps, 256 channels
    jy, ty = _run_pair("resnet18", track=False, shape=(1, 5, 128, 128))
    assert jy.shape == (1, 2, 4, 4, 256)


def test_final_block_is_preactivation():
    # layer4's last block must skip its final ReLU: outputs go negative.
    jy, _ = _run_pair("resnet18", track=False, shape=(1, 5, 64, 64))
    assert (jy < 0).any()


def test_deep_family_parameter_counts():
    """resnet101/152/200 build and their parameter counts match the
    reference modules exactly (cheap structural parity — forward parity
    for the Bottleneck wiring is covered by the resnet50 f64 test)."""
    for network in ("resnet101", "resnet152", "resnet200"):
        tmodel = ref.ref_resnet(network, track_running_stats=False)
        want = sum(p.numel() for p in tmodel.parameters())
        params, _ = resnet2d3d.init_resnet2d3d(
            jax.random.PRNGKey(0), network, track_running_stats=False)
        got = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
        assert got == want, (network, got, want)
        # key map covers every torch tensor
        keymap = tc._backbone_key_map(params)
        tkeys = {tk for tk, _ in keymap.values()}
        sd = {k for k in tmodel.state_dict()
              if "num_batches" not in k and "running_" not in k}
        assert tkeys == sd, (network, sd - tkeys, tkeys - sd)
