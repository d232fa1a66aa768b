"""LC: the downstream action classifier over the DPC trunk.

Functional re-design of the reference classifier (``eval/model_3d_lc.py``):
backbone → ReLU → temporal avg-pool → ConvGRU over ALL blocks → last-step
context → spatial avg-pool → feature-axis BatchNorm1d → dropout → linear.

Semantics preserved exactly (see tests/test_parity_lc.py):
  * backbone built with ``track_running_stats=True`` (``:26-28``) — running
    BN stats, unlike pretraining;
  * ReLU BEFORE the temporal pool (``:53-55``; the DPC head pools first);
  * ``final_bn`` is a BatchNorm1d applied along the feature axis via the
    transpose trick (``:39-41,62``);
  * classifier head: Dropout(p) + Linear with orthogonal weight / zero bias
    (``:43-45,67-73``);
  * returns (logits ``[B, 1, num_class]``, context ``[B, 1, D]``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from dpc_tpu.core.config import DPCConfig
from dpc_tpu.models import layers as L
from dpc_tpu.models import convgru, resnet2d3d

Params = dict[str, Any]


def init_lc(key: jax.Array, cfg: DPCConfig, num_classes: int
            ) -> tuple[Params, Params]:
    """Returns (params, state); state holds the BN running stats."""
    kb, kg, kf = jax.random.split(key, 3)
    d = cfg.feature_size
    params: Params = {}
    state: Params = {}
    params["backbone"], state["backbone"] = resnet2d3d.init_resnet2d3d(
        kb, cfg.network, track_running_stats=True)
    params["agg"] = convgru.init_convgru(
        kg, d, d, cfg.gru_kernel_size, cfg.gru_num_layers)
    params["final_bn"], state["final_bn"] = L.init_batchnorm(d, True)
    # orthogonal weight / zero bias (eval/model_3d_lc.py:45,67-73)
    params["final_fc"] = {
        "w": L.orthogonal_init(kf, (d, num_classes)),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    return params, state


def apply_lc(params: Params, state: Params, x: jax.Array, *,
             cfg: DPCConfig, num_classes: int, dropout: float = 0.5,
             train: bool = True, key: Optional[jax.Array] = None,
             dtype=None, axis_name: Optional[str] = None,
             input_norm: Optional[tuple] = None
             ) -> tuple[jax.Array, jax.Array, Params]:
    """Forward.  x: ``[B, N, SL, H, W, 3]`` → (logits ``[B, 1, C]``,
    context ``[B, 1, D]``, new_state).  ``input_norm=(mean, std, scale)``:
    x is UN-normalised ([0,1] f32 or raw uint8) and the normalize affine
    is folded into the stem conv (``layers.conv3d_input_norm``)."""
    b, n, sl, h, w, c = x.shape
    new_state: Params = {}
    feat, new_state["backbone"] = resnet2d3d.apply_resnet2d3d(
        params["backbone"], state["backbone"], x.reshape(b * n, sl, h, w, c),
        network=cfg.network, train=train, dtype=dtype, axis_name=axis_name,
        input_norm=input_norm)
    feat = jax.nn.relu(feat)                       # ReLU before the pool
    feat = jnp.mean(feat.astype(jnp.float32), axis=1)
    ls = cfg.last_size
    feat = feat.reshape(b, n, ls, ls, cfg.feature_size)

    kgru = kdrop = None
    if key is not None:
        kgru, kdrop = jax.random.split(key)
    outputs, _ = convgru.apply_convgru(
        params["agg"], feat, kernel_size=cfg.gru_kernel_size,
        dropout=cfg.gru_dropout, train=train, key=kgru, dtype=dtype,
        impl=cfg.gru_impl)
    context = outputs[:, -1]                       # [B, ls, ls, D]
    context = jnp.mean(context, axis=(1, 2))       # spatial avg-pool → [B, D]

    # BatchNorm1d over the feature axis: each of the D features is a BN
    # channel with B samples (the reference's transpose trick, :62)
    normed, new_state["final_bn"] = L.batchnorm(
        params["final_bn"], state["final_bn"], context, train=train,
        axis_name=axis_name)
    out = normed
    if train and dropout > 0.0 and kdrop is not None:
        out = L.dropout(kdrop, out, dropout, train=True)
    logits = L.dense(params["final_fc"], out)
    # the returned context is POST-final_bn, like the reference
    # (eval/model_3d_lc.py:62-64 rebinds context = final_bn(...)): with
    # TRAINED running stats the pre-BN features differ by the full BN
    # affine (a fresh BN is ~identity, which once hid this)
    return logits[:, None, :], normed[:, None, :], new_state
