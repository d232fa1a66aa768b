"""DPC-RNN: dense predictive-coding self-supervised model.

Functional re-design of the reference head (``dpc/model_3d.py``): encode
every block with the 2d3d-ResNet, aggregate the first ``num_seq−pred_step``
block embeddings with the ConvGRU, autoregressively predict the remaining
``pred_step`` embeddings with a 2-layer 1×1-conv MLP, and score every
predicted spatial cell against every ground-truth cell with one matmul.

Semantics preserved exactly (see tests/test_parity_dpc.py):
  * the GT embeddings are taken PRE-ReLU (backbone layer4 ends without a
    final ReLU) while the GRU consumes ReLU'd features
    (``dpc/model_3d.py:53-58``);
  * temporal average-pool collapses the ``last_duration`` output frames
    (``:53``);
  * the rollout feeds ReLU'd predictions back through the aggregator and
    keeps the raw (un-ReLU'd) predictions for scoring (``:65-72``);
  * GRU dropout stays active inside the rollout during training;
  * predictor weights orthogonal / biases zero (``:100-106``).

The loss and targets live in :mod:`dpc_tpu.ops.nce` (the reference keeps the
loss in the driver, ``dpc/main.py:213-217``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from dpc_tpu.core.config import DPCConfig
from dpc_tpu.models import layers as L
from dpc_tpu.models import convgru, resnet2d3d
from dpc_tpu.ops import nce

Params = dict[str, Any]


def init_dpc(key: jax.Array, cfg: DPCConfig) -> Params:
    kb, kg, k1, k2 = jax.random.split(key, 4)
    d = cfg.feature_size
    params: Params = {}
    params["backbone"], _ = resnet2d3d.init_resnet2d3d(
        kb, cfg.network, track_running_stats=False)
    params["agg"] = convgru.init_convgru(
        kg, d, d, cfg.gru_kernel_size, cfg.gru_num_layers)
    params["pred"] = {
        "conv1": L.init_conv2d(k1, d, d, 1, bias=True),
        "conv2": L.init_conv2d(k2, d, d, 1, bias=True),
    }
    return params


def _predictor(p: Params, h: jax.Array, dtype=None) -> jax.Array:
    """φ: 2× 1×1 conv with ReLU between (``dpc/model_3d.py:36-40``)."""
    y = L.conv2d(p["conv1"], h, dtype=dtype)
    return L.conv2d(p["conv2"], jax.nn.relu(y), dtype=dtype)


def encode_blocks(params: Params, x: jax.Array, *, cfg: DPCConfig,
                  train: bool, dtype=None,
                  axis_name: Optional[str] = None,
                  input_norm: Optional[tuple] = None) -> jax.Array:
    """Backbone over all blocks → PRE-ReLU dense embeddings.

    x: ``[B, N, SL, H, W, 3]`` → ``[B, N, ls, ls, D]`` (pre-activation).
    """
    b, n, sl, h, w, c = x.shape
    feat, _ = resnet2d3d.apply_resnet2d3d(
        params["backbone"], None, x.reshape(b * n, sl, h, w, c),
        network=cfg.network, train=train, dtype=dtype, axis_name=axis_name,
        input_norm=input_norm)
    # temporal window == full extent ⇒ plain mean (dpc/model_3d.py:53)
    assert feat.shape[1] == cfg.last_duration, (feat.shape, cfg.last_duration)
    feat = jnp.mean(feat.astype(jnp.float32), axis=1)
    ls = cfg.last_size
    return feat.reshape(b, n, ls, ls, cfg.feature_size)


def apply_dpc(params: Params, x: jax.Array, *, cfg: DPCConfig,
              train: bool = True, key: Optional[jax.Array] = None,
              dtype=None, axis_name: Optional[str] = None,
              input_norm: Optional[tuple] = None
              ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Full DPC forward.

    x: ``[B, N, SL, H, W, 3]`` floats (normalised frames, channels-last;
    with ``input_norm=(mean, std, scale)`` the frames are UN-normalised —
    [0,1] f32 or raw uint8 — and the affine is folded into the stem conv,
    ``layers.conv3d_input_norm``).
    Returns ``(score, pred, gt)`` where score is the flattened
    ``[B·P·SQ, B·P·SQ]`` similarity matrix and pred/gt are the
    ``[B, P, ls, ls, D]`` embeddings that produced it.
    """
    if x.ndim != 6:
        raise ValueError(
            f"apply_dpc expects [B, num_seq, seq_len, H, W, 3] (6-D, "
            f"channels-last); got shape {x.shape}")
    b, n = x.shape[:2]
    p_steps = cfg.pred_step
    ctx = n - p_steps

    feature_pre = encode_blocks(params, x, cfg=cfg, train=train, dtype=dtype,
                                axis_name=axis_name, input_norm=input_norm)
    gt = feature_pre[:, ctx:]                       # pre-ReLU, (−inf, +inf)
    feature = jax.nn.relu(feature_pre)              # GRU input, [0, +inf)

    kgru = krollout = None
    if key is not None:
        kgru, krollout = jax.random.split(key)

    _, last_states = convgru.apply_convgru(
        params["agg"], feature[:, :ctx], kernel_size=cfg.gru_kernel_size,
        dropout=cfg.gru_dropout, train=train, key=kgru, dtype=dtype,
        impl=cfg.gru_impl)
    hidden = [last_states[:, li] for li in range(cfg.gru_num_layers)]

    def rollout_step(carry, i):
        hid = carry
        p = _predictor(params["pred"], hid[-1], dtype=dtype)
        step_key = (jax.random.fold_in(krollout, i)
                    if krollout is not None else None)
        hid = convgru.convgru_single_step(
            params["agg"], jax.nn.relu(p), hid,
            kernel_size=cfg.gru_kernel_size, dropout=cfg.gru_dropout,
            train=train, key=step_key, dtype=dtype)
        return hid, p

    _, preds = jax.lax.scan(rollout_step, hidden,
                            jnp.arange(p_steps, dtype=jnp.uint32))
    pred = jnp.moveaxis(preds, 0, 1)                # [B, P, ls, ls, D]

    score = nce.dense_score(pred.astype(jnp.float32),
                            gt.astype(jnp.float32))
    return score, pred, gt


def extract_context(params: Params, x: jax.Array, *, cfg: DPCConfig,
                    num_blocks: Optional[int] = None, train: bool = False,
                    key: Optional[jax.Array] = None, dtype=None,
                    order: str = "lc",
                    axis_name: Optional[str] = None) -> jax.Array:
    """Feature-extraction utility: run the backbone+GRU trunk over
    ``num_blocks`` blocks and return the last-step dense context
    ``[B, ls, ls, D]`` from a DPC parameter tree.

    ``order`` picks the activation/pool ordering, which differs between
    the two reference heads and does NOT commute:
      * ``'lc'`` — ReLU then temporal mean (``eval/model_3d_lc.py:53-55``):
        the representation the downstream classifier consumes;
      * ``'dpc'`` — temporal mean then ReLU (``dpc/model_3d.py:53-56``):
        what the pretraining aggregator saw.
    """
    b, n, sl, h, w, c = x.shape
    if num_blocks is None:
        num_blocks = n
    feat, _ = resnet2d3d.apply_resnet2d3d(
        params["backbone"], None, x.reshape(b * n, sl, h, w, c),
        network=cfg.network, train=train, dtype=dtype, axis_name=axis_name)
    if order == "lc":
        feat = jnp.mean(jax.nn.relu(feat).astype(jnp.float32), axis=1)
    elif order == "dpc":
        feat = jax.nn.relu(jnp.mean(feat.astype(jnp.float32), axis=1))
    else:
        raise ValueError(f"unknown order {order!r}")
    ls = cfg.last_size
    feature = feat.reshape(b, n, ls, ls, cfg.feature_size)
    _, last_states = convgru.apply_convgru(
        params["agg"], feature[:, :num_blocks],
        kernel_size=cfg.gru_kernel_size, dropout=cfg.gru_dropout,
        train=train, key=key, dtype=dtype, impl=cfg.gru_impl)
    return last_states[:, -1]
