"""PyTorch ↔ dpc_tpu weight interchange.

Two jobs:
  1. ingest the reference's published ``.pth.tar`` checkpoints (DPC pretrain
     / LC finetune) into our param pytrees, reproducing the transfer-loading
     behaviour of ``neq_load_customized`` (``backbone/resnet_2d3d.py:310-333``):
     intersection load with a printed report of unused / unloaded keys;
  2. export our pytrees to torch state_dicts so golden parity tests can run
     the same weights through the reference model.

Layout conversions (reference is NCDHW/OIDHW; we are NDHWC/DHWIO):
  * Conv3d weight  (O, I, kT, kH, kW) ↔ (kT, kH, kW, I, O)
  * Conv2d weight  (O, I, kH, kW)    ↔ (kH, kW, I, O)
  * Linear weight  (O, I)            ↔ (I, O)
"""

from __future__ import annotations

from typing import Any

import numpy as np

Params = dict[str, Any]


def _t2j_conv3d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def _j2t_conv3d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (4, 3, 0, 1, 2))


def _t2j_conv2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _j2t_conv2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))


# ---------------------------------------------------------------------------
# Flat key mapping: our pytree paths ↔ reference state_dict keys
# ---------------------------------------------------------------------------

def flatten_pytree(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    """Flatten a nested dict/list pytree into {'a.b.0.c': leaf} paths."""
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_pytree(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_pytree(v, f"{prefix}{i}."))
    elif tree is not None:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def set_in_pytree(tree: Any, path: str, value: np.ndarray) -> None:
    keys = path.split(".")
    node = tree
    for k in keys[:-1]:
        node = node[int(k)] if isinstance(node, (list, tuple)) else node[k]
    last = keys[-1]
    if isinstance(node, tuple):
        # fail FAST: item-assignment into a tuple would raise anyway,
        # but only after earlier leaves were overwritten — a partially
        # mutated tree is worse than a clear error
        raise TypeError(f"cannot assign into tuple node at {path!r}; "
                        "param trees must use lists for sequences")
    if isinstance(node, list):
        node[int(last)] = value
    else:
        node[last] = value


def _backbone_key_map(params: Params) -> dict[str, tuple[str, str]]:
    """our-path → (torch key, kind) for a resnet2d3d param tree.

    kind ∈ {conv3d, bn_scale, bn_bias}.  Torch names follow
    ``backbone/resnet_2d3d.py``: conv1/bn1 stem, layerL.B.{conv,bn}{i},
    layerL.B.downsample.{0,1}.
    """
    m: dict[str, tuple[str, str]] = {
        "stem.conv.w": ("conv1.weight", "conv3d"),
        "stem.bn.scale": ("bn1.weight", "raw"),
        "stem.bn.bias": ("bn1.bias", "raw"),
    }
    for li in range(1, 5):
        layer = params.get(f"layer{li}")
        if layer is None:
            continue
        for bi, block in enumerate(layer):
            t = f"layer{li}.{bi}"
            for ci in (1, 2, 3):
                if f"conv{ci}" not in block:
                    continue
                m[f"layer{li}.{bi}.conv{ci}.w"] = (f"{t}.conv{ci}.weight",
                                                   "conv3d")
                m[f"layer{li}.{bi}.bn{ci}.scale"] = (f"{t}.bn{ci}.weight",
                                                     "raw")
                m[f"layer{li}.{bi}.bn{ci}.bias"] = (f"{t}.bn{ci}.bias", "raw")
            if "downsample" in block:
                m[f"layer{li}.{bi}.downsample.conv.w"] = (
                    f"{t}.downsample.0.weight", "conv3d")
                m[f"layer{li}.{bi}.downsample.bn.scale"] = (
                    f"{t}.downsample.1.weight", "raw")
                m[f"layer{li}.{bi}.downsample.bn.bias"] = (
                    f"{t}.downsample.1.bias", "raw")
    return m


def _backbone_state_key_map(state: Params) -> dict[str, tuple[str, str]]:
    """Running-stat (mean/var) keys, present when track_running_stats."""
    m: dict[str, tuple[str, str]] = {
        "stem.bn.mean": ("bn1.running_mean", "raw"),
        "stem.bn.var": ("bn1.running_var", "raw"),
    }
    for li in range(1, 5):
        layer = state.get(f"layer{li}")
        if layer is None:
            continue
        for bi, block in enumerate(layer):
            t = f"layer{li}.{bi}"
            for ci in (1, 2, 3):
                if f"bn{ci}" not in block:
                    continue
                m[f"layer{li}.{bi}.bn{ci}.mean"] = (
                    f"{t}.bn{ci}.running_mean", "raw")
                m[f"layer{li}.{bi}.bn{ci}.var"] = (
                    f"{t}.bn{ci}.running_var", "raw")
            if "downsample" in block:
                m[f"layer{li}.{bi}.downsample.bn.mean"] = (
                    f"{t}.downsample.1.running_mean", "raw")
                m[f"layer{li}.{bi}.downsample.bn.var"] = (
                    f"{t}.downsample.1.running_var", "raw")
    return m


def _convgru_key_map(params: Params) -> dict[str, tuple[str, str]]:
    """ConvGRU gates: reference names ``cell_list.L.{reset,update,out}_gate``."""
    m: dict[str, tuple[str, str]] = {}
    for li in range(len(params["cells"])):
        for gate in ("reset", "update", "out"):
            m[f"cells.{li}.{gate}.w"] = (
                f"cell_list.{li}.{gate}_gate.weight", "conv2d")
            m[f"cells.{li}.{gate}.b"] = (
                f"cell_list.{li}.{gate}_gate.bias", "raw")
    return m


def dpc_key_map(params: Params) -> dict[str, tuple[str, str]]:
    """our-path → (reference DPC_RNN state_dict key, kind).

    Reference module names: ``backbone.*`` (dpc/model_3d.py:28), ``agg.*``
    (:32), ``network_pred.{0,2}`` (:36-40).
    """
    m: dict[str, tuple[str, str]] = {}
    for k, (tk, kind) in _backbone_key_map(params["backbone"]).items():
        m[f"backbone.{k}"] = (f"backbone.{tk}", kind)
    for k, (tk, kind) in _convgru_key_map(params["agg"]).items():
        m[f"agg.{k}"] = (f"agg.{tk}", kind)
    m["pred.conv1.w"] = ("network_pred.0.weight", "conv2d")
    m["pred.conv1.b"] = ("network_pred.0.bias", "raw")
    m["pred.conv2.w"] = ("network_pred.2.weight", "conv2d")
    m["pred.conv2.b"] = ("network_pred.2.bias", "raw")
    return m


def lc_key_map(params: Params) -> dict[str, tuple[str, str]]:
    """our-path → reference LC state_dict key (``eval/model_3d_lc.py``)."""
    m: dict[str, tuple[str, str]] = {}
    for k, (tk, kind) in _backbone_key_map(params["backbone"]).items():
        m[f"backbone.{k}"] = (f"backbone.{tk}", kind)
    for k, (tk, kind) in _convgru_key_map(params["agg"]).items():
        m[f"agg.{k}"] = (f"agg.{tk}", kind)
    m["final_bn.scale"] = ("final_bn.weight", "raw")
    m["final_bn.bias"] = ("final_bn.bias", "raw")
    m["final_fc.w"] = ("final_fc.1.weight", "linear")
    m["final_fc.b"] = ("final_fc.1.bias", "raw")
    return m


def lc_state_key_map(state: Params) -> dict[str, tuple[str, str]]:
    m: dict[str, tuple[str, str]] = {}
    for k, (tk, kind) in _backbone_state_key_map(state["backbone"]).items():
        m[f"backbone.{k}"] = (f"backbone.{tk}", kind)
    m["final_bn.mean"] = ("final_bn.running_mean", "raw")
    m["final_bn.var"] = ("final_bn.running_var", "raw")
    return m


_CONVERT_T2J = {"conv3d": _t2j_conv3d, "conv2d": _t2j_conv2d,
                "linear": lambda w: np.transpose(w, (1, 0)),
                "raw": lambda w: w}
_CONVERT_J2T = {"conv3d": _j2t_conv3d, "conv2d": _j2t_conv2d,
                "linear": lambda w: np.transpose(w, (1, 0)),
                "raw": lambda w: w}


def _strip_module(sd: dict[str, Any]) -> dict[str, Any]:
    """Drop the DataParallel 'module.' prefix the reference saves with."""
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def load_torch_state_dict(tree: Any, key_map: dict[str, tuple[str, str]],
                          state_dict: dict[str, Any], *,
                          strict: bool = False, verbose: bool = True
                          ) -> tuple[Any, dict[str, list[str]]]:
    """Intersection-load a torch state_dict into a param/state pytree.

    Non-strict mode reproduces ``neq_load_customized``: load every key both
    sides share, report the rest.  Returns (updated tree, report) where
    report = {'loaded': [...], 'unused': [...], 'missing': [...]}.
    """
    import jax.numpy as jnp

    sd = _strip_module({k: np.asarray(v) for k, v in state_dict.items()})
    inverse = {tk: (ours, kind) for ours, (tk, kind) in key_map.items()}
    loaded, unused = [], []
    for tk, v in sd.items():
        if tk in inverse:
            ours, kind = inverse[tk]
            # copy=True: on CPU jnp can zero-copy a numpy view of torch
            # memory, which a later in-place optimizer.step() would mutate
            val = np.array(_CONVERT_T2J[kind](v), copy=True)
            set_in_pytree(tree, ours, jnp.asarray(val))
            loaded.append(tk)
        elif not tk.endswith("num_batches_tracked"):
            unused.append(tk)
    missing = [tk for ours, (tk, kind) in key_map.items() if tk not in sd]
    report = {"loaded": loaded, "unused": unused, "missing": missing}
    if strict and (unused or missing):
        raise KeyError(f"strict load failed: unused={unused} "
                       f"missing={missing}")
    if verbose and (unused or missing):
        print("=======Check Weights Loading======")
        print("Weights not used from pretrained file:")
        for k in unused:
            print(" ", k)
        print("Weights not loaded into new model:")
        for k in missing:
            print(" ", k)
        print("==================================")
    return tree, report


def export_torch_state_dict(tree: Any, key_map: dict[str, tuple[str, str]]
                            ) -> dict[str, np.ndarray]:
    """Our pytree → torch-layout state_dict (numpy values)."""
    flat = flatten_pytree(tree)
    out: dict[str, np.ndarray] = {}
    for ours, (tk, kind) in key_map.items():
        out[tk] = _CONVERT_J2T[kind](np.asarray(flat[ours], np.float32))
    return out


def load_reference_checkpoint(path: str, tree: Any,
                              key_map: dict[str, tuple[str, str]],
                              verbose: bool = True):
    """Load a published DPC ``.pth.tar`` checkpoint file into our pytree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return load_torch_state_dict(tree, key_map, sd, verbose=verbose)
