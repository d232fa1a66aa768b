"""2D-3D ResNet backbone family (18/34/50/101/152/200), TPU-native.

Re-design of the reference backbone (``backbone/resnet_2d3d.py``): stages 1-2
use "2D" residual blocks (1×3×3 kernels, spatial-only stride), stages 3-4 use
true 3D blocks (3×3×3, stride hits time as well), the stem never strides
time, layer4 keeps 256 planes (``:222-223``), and the final residual block of
layer4 skips its last ReLU (``:249-252``) so the DPC head can read a
pre-activation embedding.

Differences from the reference by design:
  * channels-last NDHWC layout and ``lax.conv_general_dilated`` (XLA fuses
    conv+BN+ReLU chains onto the MXU; no cuDNN-style layout juggling);
  * BN is an explicit pure function with both ``track_running_stats``
    semantics (see ``dpc_tpu.models.layers.batchnorm``);
  * architecture is data (a static plan), not subclassing.
"""

from __future__ import annotations

from typing import Any, Optional

import jax

from dpc_tpu.models import layers as L

Params = dict[str, Any]

# (block kinds per stage, blocks per stage)
ARCH: dict[str, tuple[tuple[str, str, str, str], tuple[int, int, int, int]]] = {
    "resnet18": (("basic2d", "basic2d", "basic3d", "basic3d"), (2, 2, 2, 2)),
    "resnet34": (("basic2d", "basic2d", "basic3d", "basic3d"), (3, 4, 6, 3)),
    "resnet50": (("bottleneck2d", "bottleneck2d", "bottleneck3d",
                  "bottleneck3d"), (3, 4, 6, 3)),
    "resnet101": (("bottleneck2d", "bottleneck2d", "bottleneck3d",
                   "bottleneck3d"), (3, 4, 23, 3)),
    "resnet152": (("bottleneck2d", "bottleneck2d", "bottleneck3d",
                   "bottleneck3d"), (3, 8, 36, 3)),
    "resnet200": (("bottleneck2d", "bottleneck2d", "bottleneck3d",
                   "bottleneck3d"), (3, 24, 36, 3)),
}
# layer4 planes deliberately 256, not 512 (reference :222)
STAGE_PLANES = (64, 128, 256, 256)
STAGE_STRIDES = (1, 2, 2, 2)
EXPANSION = {"basic2d": 1, "basic3d": 1, "bottleneck2d": 4, "bottleneck3d": 4}


def _block_specs(network: str) -> list[list[dict]]:
    """Static per-block spec table: kind / channels / stride / final-relu."""
    kinds, depths = ARCH[network]
    in_ch = 64
    stages = []
    for si, (kind, depth) in enumerate(zip(kinds, depths)):
        planes = STAGE_PLANES[si]
        stride = STAGE_STRIDES[si]
        is_final_stage = si == 3
        blocks = []
        for bi in range(depth):
            s = stride if bi == 0 else 1
            out_ch = planes * EXPANSION[kind]
            blocks.append({
                "kind": kind,
                "in_ch": in_ch,
                "planes": planes,
                "stride": s,
                "downsample": bi == 0 and (s != 1 or in_ch != out_ch),
                # only the LAST block of layer4 drops its final ReLU
                "final_relu": not (is_final_stage and bi == depth - 1),
            })
            in_ch = out_ch
        stages.append(blocks)
    return stages


def feature_size(network: str) -> int:
    kinds, _ = ARCH[network]
    return STAGE_PLANES[3] * EXPANSION[kinds[3]]


def _conv_shape(kind: str, stride: int) -> tuple[tuple[int, int, int],
                                                 tuple[int, int, int],
                                                 tuple[int, int, int]]:
    """(kernel, stride, padding) of the spatial conv inside a block."""
    if kind.endswith("2d"):
        return (1, 3, 3), (1, stride, stride), (0, 1, 1)
    return (3, 3, 3), (stride, stride, stride), (1, 1, 1)


def _down_stride(kind: str, stride: int) -> tuple[int, int, int]:
    return (1, stride, stride) if kind.endswith("2d") else (stride,) * 3


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_block(key: jax.Array, spec: dict, track: bool
                ) -> tuple[Params, Optional[Params]]:
    kind, in_ch, planes, stride = (spec["kind"], spec["in_ch"],
                                   spec["planes"], spec["stride"])
    keys = jax.random.split(key, 4)
    p: Params = {}
    s: Params = {}
    if kind.startswith("basic"):
        k, st, pad = _conv_shape(kind, stride)
        p["conv1"] = L.init_conv3d(keys[0], in_ch, planes, k)
        p["bn1"], s1 = L.init_batchnorm(planes, track)
        k2, _, pad2 = _conv_shape(kind, 1)
        p["conv2"] = L.init_conv3d(keys[1], planes, planes, k2)
        p["bn2"], s2 = L.init_batchnorm(planes, track)
        out_ch = planes
        if track:
            s = {"bn1": s1, "bn2": s2}
    else:
        out_ch = planes * 4
        p["conv1"] = L.init_conv3d(keys[0], in_ch, planes, (1, 1, 1))
        p["bn1"], s1 = L.init_batchnorm(planes, track)
        k, st, pad = _conv_shape(kind, stride)
        p["conv2"] = L.init_conv3d(keys[1], planes, planes, k)
        p["bn2"], s2 = L.init_batchnorm(planes, track)
        p["conv3"] = L.init_conv3d(keys[2], planes, out_ch, (1, 1, 1))
        p["bn3"], s3 = L.init_batchnorm(out_ch, track)
        if track:
            s = {"bn1": s1, "bn2": s2, "bn3": s3}
    if spec["downsample"]:
        p["downsample"] = {
            "conv": L.init_conv3d(keys[3], in_ch, out_ch, (1, 1, 1))}
        p["downsample"]["bn"], sd = L.init_batchnorm(out_ch, track)
        if track:
            s["downsample"] = {"bn": sd}
    return p, (s if track else None)


def init_resnet2d3d(key: jax.Array, network: str = "resnet18",
                    track_running_stats: bool = False
                    ) -> tuple[Params, Optional[Params]]:
    """Build the parameter (and optional BN-state) pytree.

    Init parity with the reference (``backbone/resnet_2d3d.py:224-230``):
    kaiming-normal fan_out convs, BN scale 1 / bias 0; all convs bias-free.
    """
    specs = _block_specs(network)
    n_blocks = sum(len(st) for st in specs)
    keys = jax.random.split(key, n_blocks + 1)
    params: Params = {
        "stem": {"conv": L.init_conv3d(keys[0], 3, 64, (1, 7, 7))}}
    params["stem"]["bn"], stem_state = L.init_batchnorm(
        64, track_running_stats)
    state: Params = {"stem": {"bn": stem_state}} if track_running_stats else {}
    ki = 1
    for si, stage in enumerate(specs):
        bp, bs = [], []
        for spec in stage:
            p, s = _init_block(keys[ki], spec, track_running_stats)
            ki += 1
            bp.append(p)
            bs.append(s)
        params[f"layer{si + 1}"] = bp
        if track_running_stats:
            state[f"layer{si + 1}"] = bs
    return params, (state if track_running_stats else None)


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _apply_block(p: Params, s: Optional[Params], spec: dict, x: jax.Array, *,
                 train: bool, dtype, axis_name: Optional[str]
                 ) -> tuple[jax.Array, Optional[Params]]:
    kind, stride = spec["kind"], spec["stride"]
    bn = lambda pp, ss, v: L.batchnorm(pp, ss, v, train=train,
                                       axis_name=axis_name)
    new_s: Params = {}
    g = lambda name: (s[name] if s is not None else None)

    residual = x
    k, st, pad = _conv_shape(kind, stride)
    if kind.startswith("basic"):
        out = L.conv3d(p["conv1"], x, st, pad, dtype)
        out, new_s["bn1"] = bn(p["bn1"], g("bn1"), out)
        out = jax.nn.relu(out)
        k2, st2, pad2 = _conv_shape(kind, 1)
        out = L.conv3d(p["conv2"], out, st2, pad2, dtype)
        out, new_s["bn2"] = bn(p["bn2"], g("bn2"), out)
    else:
        out = L.conv3d(p["conv1"], x, (1, 1, 1), (0, 0, 0), dtype)
        out, new_s["bn1"] = bn(p["bn1"], g("bn1"), out)
        out = jax.nn.relu(out)
        out = L.conv3d(p["conv2"], out, st, pad, dtype)
        out, new_s["bn2"] = bn(p["bn2"], g("bn2"), out)
        out = jax.nn.relu(out)
        out = L.conv3d(p["conv3"], out, (1, 1, 1), (0, 0, 0), dtype)
        out, new_s["bn3"] = bn(p["bn3"], g("bn3"), out)

    if spec["downsample"]:
        residual = L.conv3d(p["downsample"]["conv"], x,
                            _down_stride(kind, stride), (0, 0, 0), dtype)
        sd = s["downsample"]["bn"] if s is not None else None
        residual, nsd = bn(p["downsample"]["bn"], sd, residual)
        new_s["downsample"] = {"bn": nsd}

    out = out + residual
    if spec["final_relu"]:
        out = jax.nn.relu(out)
    return out, (new_s if s is not None else None)


def apply_resnet2d3d(params: Params, state: Optional[Params], x: jax.Array, *,
                     network: str = "resnet18", train: bool = True,
                     dtype=None, axis_name: Optional[str] = None,
                     stem_impl: str = "auto",
                     input_norm: Optional[tuple] = None
                     ) -> tuple[jax.Array, Optional[Params]]:
    """Forward pass.  x: NDHWC ``[B, T, H, W, 3]`` → ``[B, T/4, H/32, W/32, D]``.

    ``state``/returned state are the BN running stats (None when the net was
    built with ``track_running_stats=False``).

    ``stem_impl``: "fused" applies conv→BN→ReLU→pool with the normalize
    deferred to pooled resolution (``layers.fused_stem`` — exact
    reformulation covering all three BN modes, including the
    running-stats EMA); "unfused" keeps the literal op order; "auto"
    picks "fused" on TPU.

    ``input_norm=(mean, std, scale)`` folds the per-channel input
    normalize into the stem conv (``layers.conv3d_input_norm``): ``x`` is
    then the UN-normalised augment output — [0,1] f32 (scale=1) or raw
    uint8 (scale=255) — and the forward matches the normalised-input
    forward to rounding (the --device_augment fold, PARITY.md #14).
    """
    specs = _block_specs(network)
    track = state is not None
    new_state: Params = {}

    if stem_impl not in ("auto", "fused", "unfused"):
        raise ValueError(f"unknown stem_impl {stem_impl!r} "
                         "(expected auto | fused | unfused)")
    if stem_impl == "auto":
        stem_impl = ("fused" if jax.default_backend() == "tpu"
                     else "unfused")
    if stem_impl == "fused":
        h, ns = L.fused_stem(params["stem"]["conv"], params["stem"]["bn"],
                             x, state=state["stem"]["bn"] if track else None,
                             train=train, dtype=dtype, axis_name=axis_name,
                             input_norm=input_norm)
        if track:
            new_state["stem"] = {"bn": ns}
    else:
        if input_norm is None:
            h = L.conv3d(params["stem"]["conv"], x, (1, 2, 2), (0, 3, 3),
                         dtype)
        else:
            h = L.conv3d_input_norm(params["stem"]["conv"], x, (1, 2, 2),
                                    (0, 3, 3), dtype, input_norm)
        h, ns = L.batchnorm(params["stem"]["bn"],
                            state["stem"]["bn"] if track else None, h,
                            train=train, axis_name=axis_name)
        if track:
            new_state["stem"] = {"bn": ns}
        h = L.relu_maxpool_stem(h)

    for si, stage in enumerate(specs):
        name = f"layer{si + 1}"
        stage_state = []
        for bi, spec in enumerate(stage):
            bs = state[name][bi] if track else None
            h, nbs = _apply_block(params[name][bi], bs, spec, h,
                                  train=train, dtype=dtype,
                                  axis_name=axis_name)
            stage_state.append(nbs)
        if track:
            new_state[name] = stage_state
    return h, (new_state if track else None)
