"""Golden parity: scanned ConvGRU vs the reference Python-loop ConvGRU."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_harness as ref
from dpc_tpu.models import convgru
from dpc_tpu.utils import torch_compat as tc


@pytest.mark.parametrize("kernel_size,num_layers",
                         [(1, 1), (3, 1), (1, 2), (3, 2)])
def test_convgru_parity(kernel_size, num_layers):
    in_ch, hid_ch, B, T, H, W = 10, 20, 4, 5, 6, 6
    tmodel = ref.ref_convgru(in_ch, hid_ch, kernel_size, num_layers)
    params = convgru.init_convgru(jax.random.PRNGKey(0), in_ch, hid_ch,
                                  kernel_size, num_layers)
    params = ref.load_into_jax(tmodel, params, tc._convgru_key_map(params))

    rng = np.random.default_rng(7)
    x = rng.normal(size=(B, T, H, W, in_ch)).astype(np.float32)
    with torch.no_grad():
        tout, thn = tmodel(torch.from_numpy(
            np.ascontiguousarray(np.transpose(x, (0, 1, 4, 2, 3)))))
    jout, jhn = convgru.apply_convgru(params, jnp.asarray(x),
                                      kernel_size=kernel_size, train=False)
    np.testing.assert_allclose(
        np.asarray(jout), np.transpose(tout.numpy(), (0, 1, 3, 4, 2)),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jhn), np.transpose(thn.numpy(), (0, 1, 3, 4, 2)),
        rtol=1e-4, atol=1e-5)


def test_convgru_initial_hidden():
    """Parity when an initial hidden state is supplied (the rollout path)."""
    in_ch = hid_ch = 8
    B, H, W = 2, 4, 4
    tmodel = ref.ref_convgru(in_ch, hid_ch, 1, 1)
    params = convgru.init_convgru(jax.random.PRNGKey(1), in_ch, hid_ch, 1, 1)
    params = ref.load_into_jax(tmodel, params, tc._convgru_key_map(params))

    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, 1, H, W, in_ch)).astype(np.float32)
    h0 = rng.normal(size=(B, H, W, hid_ch)).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(
            np.ascontiguousarray(np.transpose(x, (0, 1, 4, 2, 3))))
        th = torch.from_numpy(
            np.ascontiguousarray(np.transpose(h0, (0, 3, 1, 2))))
        _, thn = tmodel(tx, th.unsqueeze(0))
    new_hidden = convgru.convgru_single_step(
        params, jnp.asarray(x[:, 0]), [jnp.asarray(h0)], train=False)
    np.testing.assert_allclose(
        np.asarray(new_hidden[0]),
        np.transpose(thn[:, 0].numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-5)


def test_convgru_dropout_statistics():
    """Train-mode dropout: ~10% of hidden units zeroed, rest scaled by 1/0.9."""
    params = convgru.init_convgru(jax.random.PRNGKey(2), 8, 8, 1, 1)
    x = jnp.ones((8, 6, 4, 4, 8))
    out, _ = convgru.apply_convgru(params, x, train=True, dropout=0.1,
                                   key=jax.random.PRNGKey(5))
    zeros = float(jnp.mean((out == 0).astype(jnp.float32)))
    assert 0.05 < zeros < 0.2
