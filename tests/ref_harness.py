"""Harness for golden parity tests against the reference PyTorch code.

Imports the read-only reference implementation from /root/reference, shimmed
to run on CPU (the reference hardcodes ``.cuda()`` inside model code —
``dpc/model_3d.py:88``, ``backbone/convrnn.py:27``), so our JAX models can
be checked value-for-value with identical weights.
"""

from __future__ import annotations

import sys

import numpy as np
import torch

REF = "/root/reference"
for sub in ("backbone", "dpc", "eval", "utils"):
    p = f"{REF}/{sub}"
    if p not in sys.path:
        sys.path.insert(0, p)

# CPU shim: make .cuda() a no-op so reference modules run on this box.
torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]

torch.manual_seed(0)


def ref_resnet(network: str = "resnet18", track_running_stats: bool = False):
    from select_backbone import select_resnet

    model, _ = select_resnet(network, track_running_stats=track_running_stats)
    return model.eval()


def ref_convgru(input_size: int, hidden_size: int, kernel_size: int,
                num_layers: int):
    from convrnn import ConvGRU

    return ConvGRU(input_size=input_size, hidden_size=hidden_size,
                   kernel_size=kernel_size, num_layers=num_layers).eval()


def ref_dpc(sample_size: int, num_seq: int, seq_len: int, pred_step: int,
            network: str):
    from model_3d import DPC_RNN

    return DPC_RNN(sample_size=sample_size, num_seq=num_seq, seq_len=seq_len,
                   pred_step=pred_step, network=network).eval()


def ref_lc(sample_size: int, num_seq: int, seq_len: int, network: str,
           num_class: int, dropout: float = 0.5):
    from model_3d_lc import LC

    return LC(sample_size=sample_size, num_seq=num_seq, seq_len=seq_len,
              network=network, num_class=num_class, dropout=dropout).eval()


def _stub_torchvision():
    """Satisfy the reference's module-level torchvision imports (this box
    has no torchvision wheel) with empty module objects; the code paths we
    exercise never call into them."""
    import types

    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional", "torchvision.datasets",
                 "torchvision.models", "torchvision.utils"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
            parent, _, child = name.rpartition(".")
            if parent:
                setattr(sys.modules[parent], child, mod)


def ref_dataset_modules():
    """Import the reference dataset modules (``dpc/dataset_3d.py``,
    ``eval/dataset_3d_lc.py``) with a torchvision stub.

    The dataset classes themselves never call torchvision — it is only a
    module-level import there and in ``utils/augmentation.py`` — but this
    box has no torchvision wheel, so satisfy the import with empty module
    objects.  Callers pass their own ``transform``.
    """
    _stub_torchvision()
    import dataset_3d
    import dataset_3d_lc

    return dataset_3d, dataset_3d_lc


def ref_eval_module():
    """Import the live reference finetune driver (``eval/test.py``) as a
    module, for its ``MultiStepLR_Restart_Multiplier`` and friends.

    Loaded under a private name (importing it as ``test`` would shadow
    the stdlib/pytest namespaces).  Module level only defines the argparse
    parser and imports — ``parse_args`` happens inside ``main()`` — so the
    import is side-effect-free beyond the torchvision stubs.
    """
    import importlib.util

    name = "_ref_eval_test"
    if name in sys.modules:
        return sys.modules[name]
    _stub_torchvision()
    spec = importlib.util.spec_from_file_location(name, f"{REF}/eval/test.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
    except BaseException:
        # don't cache a half-initialized module: later callers would get
        # a misleading AttributeError instead of the real import error
        del sys.modules[name]
        raise
    return mod


def to_torch_video(x_ndhwc: np.ndarray) -> torch.Tensor:
    """[B, N, SL, H, W, C] (ours) → [B, N, C, SL, H, W] (reference)."""
    return torch.from_numpy(np.ascontiguousarray(
        np.transpose(x_ndhwc, (0, 1, 5, 2, 3, 4)))).float()


def load_into_jax(torch_module, jax_tree, key_map, expect: str = "params"):
    """Copy a torch module's weights into our pytree; assert full coverage.

    Params and BN running stats live in separate pytrees on our side, so
    each load run legitimately skips the other group's torch keys.
    """
    from dpc_tpu.utils import torch_compat as tc

    sd = {k: v.detach().numpy() for k, v in torch_module.state_dict().items()}
    tree, report = tc.load_torch_state_dict(jax_tree, key_map, sd,
                                            verbose=False)
    assert not report["missing"], report["missing"]
    if expect == "params":
        unexpected = [k for k in report["unused"] if "running_" not in k]
    else:
        unexpected = [k for k in report["unused"] if "running_" in k]
    # the reference ConvGRU registers each cell twice (setattr name
    # ConvGRUCell_NN + cell_list.N, convrnn.py:53-58) — same tensors,
    # loaded via the cell_list alias
    unexpected = [k for k in unexpected if not k.startswith("ConvGRUCell_")
                  and ".ConvGRUCell_" not in k]
    assert not unexpected, unexpected
    return tree
