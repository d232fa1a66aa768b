"""Convolutional GRU aggregator as a scanned, MXU-friendly recurrence.

Re-design of the reference ConvGRU (``backbone/convrnn.py``): a stack of
gated conv-recurrent cells run over the block axis.  The reference loops in
Python over time (``convrnn.py:76-79``); here the time loop is a
``jax.lax.scan`` (traced once, constant compile time, remat-friendly) and
the reset/update gates are evaluated as one fused convolution.  For the
canonical ``kernel_size=1`` (``dpc/model_3d.py:32-35``) every gate lowers to
a per-spatial-cell matmul on the MXU.

Semantics preserved exactly:
  * gate wiring ``h' = h·(1−z) + tanh(out([x, h·r]))·z`` (``convrnn.py:30-34``)
    with z/r computed from ``[x, h]``;
  * dropout p=0.1 applied to the hidden state at EVERY timestep, and the
    dropped hidden both feeds the next step and is the step's output
    (``convrnn.py:59,78``) — active during the autoregressive rollout too;
  * orthogonal weight / zero bias init (``convrnn.py:17-22``);
  * returns (per-step outputs of the last layer, stacked per-layer final
    states), mirroring ``convrnn.py:81-88``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from dpc_tpu.models import layers as L

Params = dict[str, Any]


def init_convgru(key: jax.Array, input_size: int, hidden_size: int,
                 kernel_size: int = 1, num_layers: int = 1) -> Params:
    """Per-layer gate convolutions over channel-concat ``[x, h]``."""
    cells = []
    for i in range(num_layers):
        in_ch = input_size if i == 0 else hidden_size
        kr, ku, ko = jax.random.split(jax.random.fold_in(key, i), 3)
        cells.append({
            "reset": L.init_conv2d(kr, in_ch + hidden_size, hidden_size,
                                   kernel_size, bias=True),
            "update": L.init_conv2d(ku, in_ch + hidden_size, hidden_size,
                                    kernel_size, bias=True),
            "out": L.init_conv2d(ko, in_ch + hidden_size, hidden_size,
                                 kernel_size, bias=True),
        })
    return {"cells": cells}


def convgru_cell(cell: Params, x: jax.Array, h: jax.Array,
                 kernel_size: int = 1, dtype=None) -> jax.Array:
    """One gated step.  x: ``[B, H, W, Cin]``, h: ``[B, H, W, Ch]``."""
    pad = kernel_size // 2
    xh = jnp.concatenate([x, h], axis=-1)
    # Fused reset+update: one conv with stacked output channels.
    zr_w = jnp.concatenate([cell["update"]["w"], cell["reset"]["w"]], axis=-1)
    zr_b = jnp.concatenate([cell["update"]["b"], cell["reset"]["b"]], axis=-1)
    zr = L.conv2d({"w": zr_w, "b": zr_b}, xh, padding=pad, dtype=dtype)
    z, r = jnp.split(jax.nn.sigmoid(zr), 2, axis=-1)
    out = jnp.tanh(L.conv2d(cell["out"],
                            jnp.concatenate([x, h * r], axis=-1),
                            padding=pad, dtype=dtype))
    return h * (1.0 - z) + out * z


def apply_convgru(params: Params, x: jax.Array,
                  hidden: Optional[list[jax.Array]] = None, *,
                  kernel_size: int = 1, dropout: float = 0.1,
                  train: bool = True, key: Optional[jax.Array] = None,
                  dtype=None, impl: str = "scan"
                  ) -> tuple[jax.Array, jax.Array]:
    """Run the stack over a block sequence.

    x: ``[B, T, H, W, C]``;  hidden: optional per-layer ``[B, H, W, Ch]``
    initial states.  Returns ``(outputs [B, T, H, W, Ch],
    last_states [B, num_layers, H, W, Ch])``.

    impl: 'scan' (lax.scan over fused-gate steps) or 'pallas' (whole
    recurrence in one Pallas kernel per layer; kernel_size=1 only —
    numerically identical incl. dropout UNDER f32, see
    ops/convgru_pallas.py; under ``dtype=bfloat16`` the scan path
    computes gates in bf16 while the kernel computes in f32, so the
    impls agree only to bf16 rounding there).
    """
    cells = params["cells"]
    num_layers = len(cells)
    b, t, hgt, wid, _ = x.shape
    ch = cells[0]["out"]["w"].shape[-1]
    if hidden is None:
        hidden = [jnp.zeros((b, hgt, wid, ch), x.dtype)] * num_layers
    use_dropout = train and dropout > 0.0 and key is not None

    if impl == "pallas" and kernel_size == 1:
        from dpc_tpu.ops import convgru_pallas

        cur = x
        last_states = []
        for li, cell in enumerate(cells):
            lkey = (jax.random.fold_in(key, li) if use_dropout else None)
            cur, h_last = convgru_pallas.fused_convgru_layer(
                cell, cur, hidden[li].astype(cur.dtype),
                dropout=dropout if use_dropout else 0.0,
                train=train, key=lkey)
            last_states.append(h_last)
        return cur, jnp.stack(last_states, axis=1)

    seq = jnp.moveaxis(x, 1, 0)  # time-major [T, B, H, W, C]
    last_states = []
    for li, cell in enumerate(cells):
        if use_dropout:
            step_keys = jax.random.split(jax.random.fold_in(key, li), t)
        else:
            step_keys = jnp.zeros((t, 2), jnp.uint32)

        def step(h, inp, _cell=cell):
            xt, k = inp
            h_new = convgru_cell(_cell, xt, h, kernel_size, dtype)
            if use_dropout:
                h_new = L.dropout(k, h_new, dropout, train=True)
            return h_new, h_new

        h_last, outs = jax.lax.scan(step, hidden[li], (seq, step_keys))
        seq = outs
        last_states.append(h_last)
    outputs = jnp.moveaxis(seq, 0, 1)
    return outputs, jnp.stack(last_states, axis=1)


def convgru_single_step(params: Params, x: jax.Array,
                        hidden: list[jax.Array], *, kernel_size: int = 1,
                        dropout: float = 0.1, train: bool = True,
                        key: Optional[jax.Array] = None,
                        dtype=None) -> list[jax.Array]:
    """Advance every layer by ONE step (the autoregressive-rollout path,
    ``dpc/model_3d.py:70``).  Returns the new per-layer hidden list."""
    new_hidden = []
    inp = x
    for li, cell in enumerate(params["cells"]):
        h_new = convgru_cell(cell, inp, hidden[li], kernel_size, dtype)
        if train and dropout > 0.0 and key is not None:
            h_new = L.dropout(jax.random.fold_in(key, li), h_new, dropout,
                              train=True)
        new_hidden.append(h_new)
        inp = h_new
    return new_hidden
