"""Round-trip interop: our checkpoint → .pth.tar → loads into the actual
reference PyTorch model and reproduces our forward."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

import ref_harness as ref
from dpc_tpu.core import checkpoint as ckpt
from dpc_tpu.core.config import DPCConfig
from dpc_tpu.models import dpc
from dpc_tpu.utils import export_torch
from dpc_tpu.utils import torch_compat as tc


def test_export_roundtrip_into_reference_model(tmp_path):
    cfg = DPCConfig(img_dim=64, num_seq=4, seq_len=5, pred_step=2)
    params = dpc.init_dpc(jax.random.PRNGKey(7), cfg)

    # save a run-dir style checkpoint, export it to .pth.tar
    mgr = ckpt.make_manager(str(tmp_path / "run" / "model"))
    ckpt.save(mgr, 1, {"params": jax.device_get(params)})
    out = str(tmp_path / "exported.pth.tar")
    export_torch.export(str(tmp_path / "run"), out, model="dpc",
                        net=cfg.network, img_dim=cfg.img_dim,
                        num_seq=cfg.num_seq, seq_len=cfg.seq_len,
                        pred_step=cfg.pred_step)

    # load into the REFERENCE model and compare forwards
    tmodel = ref.ref_dpc(cfg.img_dim, cfg.num_seq, cfg.seq_len,
                         cfg.pred_step, cfg.network)
    payload = torch.load(out, weights_only=False)
    sd = {k[len("module."):]: v for k, v in payload["state_dict"].items()}
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    # ConvGRU's duplicate setattr aliases are the only acceptable gaps
    assert all("ConvGRUCell" in k for k in missing), missing
    assert not unexpected, unexpected

    x = np.random.default_rng(0).normal(
        size=(2, cfg.num_seq, cfg.seq_len, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        tscore, _ = tmodel(ref.to_torch_video(x))
    jscore, _, _ = dpc.apply_dpc(params, jnp.asarray(x), cfg=cfg,
                                 train=False)
    np.testing.assert_allclose(np.asarray(jscore),
                               tscore.numpy().reshape(jscore.shape),
                               rtol=1e-3, atol=1e-3)
