"""Backbone registry / factory — the ``select_backbone`` equivalent.

Reference: ``backbone/select_backbone.py:3-21`` returns ``(model, param)``
where param carries the feature size consumed by the heads.  Here the
factory returns the functional (init, apply) pair plus the same param dict.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

from dpc_tpu.models import resnet2d3d

Params = dict[str, Any]


def select_backbone(network: str, track_running_stats: bool = True
                    ) -> tuple[Callable, Callable, dict]:
    """→ (init_fn(key), apply_fn(params, state, x, **kw), param dict).

    param mirrors the reference's dict: ``feature_size`` (256 for
    BasicBlock nets, 1024 for Bottleneck — ``select_backbone.py:4-20``).
    """
    if network not in resnet2d3d.ARCH:
        raise ValueError(f"unknown backbone: {network!r}")
    init_fn = functools.partial(resnet2d3d.init_resnet2d3d,
                                network=network,
                                track_running_stats=track_running_stats)
    apply_fn = functools.partial(resnet2d3d.apply_resnet2d3d,
                                 network=network)
    param = {"feature_size": resnet2d3d.feature_size(network)}
    return init_fn, apply_fn, param


def list_backbones() -> list[str]:
    return sorted(resnet2d3d.ARCH)
