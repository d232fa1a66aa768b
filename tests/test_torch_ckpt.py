"""Reference .pth.tar checkpoint ingestion: the published-checkpoint
workflow (README.md:24-38 of the reference) against our loaders."""

import numpy as np
import torch

import jax

import ref_harness as ref
from dpc_tpu.core import checkpoint as ckpt
from dpc_tpu.core.config import DPCConfig
from dpc_tpu.models import dpc, lc
from dpc_tpu.utils import torch_compat as tc


def _save_reference_ckpt(tmp_path, module, epoch=42):
    """Write a checkpoint exactly as the reference does
    (dpc/main.py:168-174: DataParallel 'module.'-prefixed keys)."""
    sd = {f"module.{k}": v for k, v in module.state_dict().items()}
    path = str(tmp_path / f"epoch{epoch}.pth.tar")
    torch.save({"epoch": epoch, "net": "resnet18", "state_dict": sd,
                "best_acc": 0.5, "iteration": 1000}, path)
    return path


def test_ingest_dpc_pth_tar(tmp_path):
    cfg = DPCConfig(img_dim=64, num_seq=4, seq_len=5, pred_step=2)
    tmodel = ref.ref_dpc(cfg.img_dim, cfg.num_seq, cfg.seq_len,
                         cfg.pred_step, cfg.network)
    path = _save_reference_ckpt(tmp_path, tmodel)

    params = dpc.init_dpc(jax.random.PRNGKey(0), cfg)
    params, report = tc.load_reference_checkpoint(
        path, params, tc.dpc_key_map(params), verbose=False)
    assert not report["missing"]
    # weights actually landed: compare one conv both sides
    want = tmodel.state_dict()["backbone.conv1.weight"].numpy()
    got = np.asarray(params["backbone"]["stem"]["conv"]["w"])
    np.testing.assert_allclose(got, np.transpose(want, (2, 3, 4, 1, 0)))


def test_pretrain_transfer_from_pth_tar(tmp_path):
    """--pretrain <file>.pth.tar loads the DPC trunk into LC params via
    the key-intersection path (eval/test.py:149-158 workflow)."""
    cfg = DPCConfig(img_dim=64, num_seq=4, seq_len=5, pred_step=2)
    tmodel = ref.ref_dpc(cfg.img_dim, cfg.num_seq, cfg.seq_len,
                         cfg.pred_step, cfg.network)
    path = _save_reference_ckpt(tmp_path, tmodel)

    lc_params, _ = lc.init_lc(jax.random.PRNGKey(1), cfg, num_classes=7)
    head_before = np.asarray(lc_params["final_fc"]["w"]).copy()
    loaded = ckpt.load_pretrained(path, lc_params, tc.lc_key_map,
                                  verbose=False)
    want = tmodel.state_dict()["backbone.conv1.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(loaded["backbone"]["stem"]["conv"]["w"]),
        np.transpose(want, (2, 3, 4, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(loaded["final_fc"]["w"]), head_before)
