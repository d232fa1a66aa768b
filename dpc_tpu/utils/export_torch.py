"""Export a dpc_tpu checkpoint to the reference's ``.pth.tar`` format.

Round-trip interop: our ``--pretrain``/``--test`` already ingest the
reference's checkpoints; this CLI goes the other way, so a model pretrained
here can be finetuned/evaluated with the original PyTorch code (keys are
'module.'-prefixed exactly as ``nn.DataParallel`` saves them,
``dpc/main.py:168-174``).

Usage:
  python -m dpc_tpu.utils.export_torch <run_dir> out.pth.tar \
      [--model dpc|lc] [--net resnet18] [--img_dim 128] ...
"""

from __future__ import annotations

import argparse

import numpy as np


def export(run_dir: str, out_path: str, *, model: str = "dpc",
           net: str = "resnet18", img_dim: int = 128, num_seq: int = 8,
           seq_len: int = 5, pred_step: int = 3,
           num_classes: int = 101) -> dict:
    import jax
    import torch

    from dpc_tpu.core import checkpoint as ckpt
    from dpc_tpu.core.config import DPCConfig
    from dpc_tpu.utils import torch_compat as tc

    cfg = DPCConfig(img_dim=img_dim, num_seq=num_seq, seq_len=seq_len,
                    pred_step=pred_step, network=net)
    if model == "dpc":
        from dpc_tpu.models import dpc as m

        params = m.init_dpc(jax.random.PRNGKey(0), cfg)
        params = ckpt.load_pretrained(run_dir, params, tc.dpc_key_map,
                                      verbose=False)
        sd = tc.export_torch_state_dict(params, tc.dpc_key_map(params))
    elif model == "lc":
        from dpc_tpu.models import lc as m

        params, state = m.init_lc(jax.random.PRNGKey(0), cfg, num_classes)
        params = ckpt.load_pretrained(run_dir, params, tc.lc_key_map,
                                      verbose=False)
        sd = tc.export_torch_state_dict(params, tc.lc_key_map(params))
        # running stats restore too when present in the checkpoint
        try:
            import orbax.checkpoint as ocp

            import os
            path = run_dir if not os.path.isdir(
                os.path.join(run_dir, "model")) \
                else os.path.join(run_dir, "model")
            mgr = ckpt.make_manager(path, read_only=True)
            raw = mgr.restore(mgr.latest_step(),
                              args=ocp.args.StandardRestore())
            if isinstance(raw, dict) and "bn_state" in raw:
                state = ckpt.transfer_load(state, raw["bn_state"],
                                           verbose=False)
                sd.update(tc.export_torch_state_dict(
                    state, tc.lc_state_key_map(state)))
        except Exception as e:
            print(f"[export] no running stats exported: {e}")
    else:
        raise ValueError(model)

    torch_sd = {f"module.{k}": torch.from_numpy(np.asarray(v))
                for k, v in sd.items()}
    payload = {"epoch": 0, "net": net, "state_dict": torch_sd,
               "best_acc": 0.0, "iteration": 0}
    torch.save(payload, out_path)
    print(f"[export] wrote {len(torch_sd)} tensors → {out_path}")
    return payload


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir", help="dpc_tpu run dir (or its model/ subdir)")
    p.add_argument("out_path")
    p.add_argument("--model", default="dpc", choices=["dpc", "lc"])
    p.add_argument("--net", default="resnet18")
    p.add_argument("--img_dim", default=128, type=int)
    p.add_argument("--num_seq", default=8, type=int)
    p.add_argument("--seq_len", default=5, type=int)
    p.add_argument("--pred_step", default=3, type=int)
    p.add_argument("--num_class", default=101, type=int)
    a = p.parse_args(argv)
    export(a.run_dir, a.out_path, model=a.model, net=a.net,
           img_dim=a.img_dim, num_seq=a.num_seq, seq_len=a.seq_len,
           pred_step=a.pred_step, num_classes=a.num_class)


if __name__ == "__main__":
    main()
