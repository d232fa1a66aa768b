"""REAL multi-process multi-host test: two jax processes (4 virtual CPU
devices each) form one 8-device mesh; per-host loader shards feed
process-local data; the sharded train step produces the same loss as the
single-process 8-device run."""

import json
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> str:
    """Ephemeral coordinator port — a fixed constant can collide with a
    stale worker or a parallel CI run and hang jax.distributed.initialize
    until its 600 s timeout."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return str(s.getsockname()[1])


def test_init_multihost_single_process_fallback():
    """init_multihost on a host with no coordinator/cluster env must
    return (0, 1) — and must NOT query the backend before initialize()
    (that used to make initialize() always raise, with a blanket except
    silently degrading real multihost runs to duplicates)."""
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');\n"
            "from dpc_tpu.parallel import mesh\n"
            "print('RESULT', mesh.init_multihost())\n")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=dict(os.environ, PYTHONPATH="/root/repo:/root/.axon_site"),
        cwd="/root/repo", timeout=300)
    assert "RESULT (0, 1)" in out.stdout, out.stdout + out.stderr


WORKER = r"""
import os, sys, json
proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=proc_id)
import jax.numpy as jnp
import numpy as np
from dpc_tpu.core.config import DPCConfig, TrainConfig
from dpc_tpu.models import dpc
from dpc_tpu.parallel import mesh as meshlib
from dpc_tpu.train import optim, pretrain_step

assert jax.process_count() == 2 and len(jax.devices()) == 8
CFG = DPCConfig(img_dim=32, num_seq=3, seq_len=4, pred_step=1)
B = 16
tcfg = TrainConfig(batch_size=B, lr=1e-3, wd=1e-5, negatives="global",
                   donate=False)
mesh = meshlib.make_mesh()
params = dpc.init_dpc(jax.random.PRNGKey(0), CFG)
tx = optim.pretrain_optimizer(params, tcfg.lr, tcfg.wd)
state = meshlib.replicate(mesh, pretrain_step.TrainState(
    params, tx.init(params), jnp.zeros((), jnp.int32)))
step = pretrain_step.make_pretrain_step(CFG, tcfg, mesh, tx)

full = np.asarray(jax.random.normal(
    jax.random.PRNGKey(1), (B, 3, 4, 32, 32, 3)), np.float32)
local = full[proc_id * (B // 2):(proc_id + 1) * (B // 2)]
xb = meshlib.shard_batch(mesh, local)
state, metrics = step(state, xb, jax.random.PRNGKey(42))
print("RESULT " + json.dumps({"loss": float(metrics["loss"])}), flush=True)
"""


def test_two_process_train_step_matches_single_process(tmp_path):
    env = dict(os.environ,
               PYTHONPATH="/root/repo:/root/.axon_site")
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd="/root/repo") for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        losses.append(json.loads(lines[0][len("RESULT "):])["loss"])
    assert abs(losses[0] - losses[1]) < 1e-6, losses

    # single-process 8-device reference with the SAME global batch
    import jax
    import jax.numpy as jnp

    from dpc_tpu.core.config import DPCConfig, TrainConfig
    from dpc_tpu.models import dpc
    from dpc_tpu.parallel import mesh as meshlib
    from dpc_tpu.train import optim, pretrain_step

    CFG = DPCConfig(img_dim=32, num_seq=3, seq_len=4, pred_step=1)
    B = 16
    tcfg = TrainConfig(batch_size=B, lr=1e-3, wd=1e-5, negatives="global",
                       donate=False)
    mesh = meshlib.make_mesh()
    params = dpc.init_dpc(jax.random.PRNGKey(0), CFG)
    tx = optim.pretrain_optimizer(params, tcfg.lr, tcfg.wd)
    state = meshlib.replicate(mesh, pretrain_step.TrainState(
        params, tx.init(params), jnp.zeros((), jnp.int32)))
    step = pretrain_step.make_pretrain_step(CFG, tcfg, mesh, tx)
    full = np.asarray(jax.random.normal(
        jax.random.PRNGKey(1), (B, 3, 4, 32, 32, 3)), np.float32)
    xb = meshlib.shard_batch(mesh, jnp.asarray(full))
    _, metrics = step(state, xb, jax.random.PRNGKey(42))
    np.testing.assert_allclose(losses[0], float(metrics["loss"]),
                               rtol=1e-5)


TEST_WORKER = r"""
import os, sys, json
proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=proc_id)
from dpc_tpu.models import lc
from dpc_tpu.train import evaluate

TINY = ["--dataset", "synthetic", "--batch_size", "8", "--img_dim", "32",
        "--num_seq", "3", "--seq_len", "4", "--compute_dtype", "float32",
        "--test", "random", "--seed", "0"]
args = evaluate.build_parser().parse_args(TINY + sys.argv[4:])
cfg = evaluate.config_from_args(args)
params, bn_state = lc.init_lc(jax.random.PRNGKey(666), cfg.model,
                              cfg.eval.num_classes)
loss, top1 = evaluate.run_test(cfg, params, bn_state,
                               sys.argv[3], window_batch=16,
                               shard_id=proc_id, num_shards=2)
print("RESULT " + json.dumps({"loss": loss, "top1": top1}), flush=True)
"""


def _two_process_dense_test(tmp_path, extra):
    env = dict(os.environ, PYTHONPATH="/root/repo:/root/.axon_site")
    script = tmp_path / "test_worker.py"
    script.write_text(TEST_WORKER)
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), port,
         str(tmp_path / f"out{i}")] + extra,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd="/root/repo") for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append(json.loads(lines[0][len("RESULT "):]))
    return results


def _single_process_dense_test(tmp_path):
    import jax

    from dpc_tpu.models import lc
    from dpc_tpu.train import evaluate

    TINY = ["--dataset", "synthetic", "--batch_size", "8", "--img_dim",
            "32", "--num_seq", "3", "--seq_len", "4", "--compute_dtype",
            "float32", "--test", "random", "--seed", "0"]
    args = evaluate.build_parser().parse_args(TINY)
    cfg = evaluate.config_from_args(args)
    params, bn_state = lc.init_lc(jax.random.PRNGKey(666), cfg.model,
                                  cfg.eval.num_classes)
    return evaluate.run_test(cfg, params, bn_state,
                             str(tmp_path / "single"), window_batch=16)


def test_two_process_dense_test_matches_single_process(tmp_path):
    """--multihost dense test: videos sharded across processes, metrics
    all-gathered — must equal the single-process run_test exactly."""
    results = _two_process_dense_test(tmp_path, [])
    assert results[0] == results[1], results   # both saw the reduced metrics
    assert os.path.exists(tmp_path / "out0" / "test_log.md")
    assert not os.path.exists(tmp_path / "out1" / "test_log.md")

    loss, top1 = _single_process_dense_test(tmp_path)
    np.testing.assert_allclose(results[0]["loss"], loss, rtol=1e-5)
    np.testing.assert_allclose(results[0]["top1"], top1, rtol=1e-12)


def test_two_process_dense_test_pod_model_parallel(tmp_path):
    """A pod-trained global ``--model_parallel`` need not divide one
    host's local device count (here 8 across 2 hosts × 4 devices).  The
    dense test re-meshes per host, so it must clamp the model factor to
    the local count (window rows are interchangeable across axes) rather
    than crash after training succeeded — and still reproduce the
    single-process numbers exactly."""
    results = _two_process_dense_test(tmp_path, ["--model_parallel", "8"])
    assert results[0] == results[1], results

    loss, top1 = _single_process_dense_test(tmp_path)
    np.testing.assert_allclose(results[0]["loss"], loss, rtol=1e-5)
    np.testing.assert_allclose(results[0]["top1"], top1, rtol=1e-12)


def test_two_process_dense_test_device_augment_matches_host_chain(tmp_path):
    """--multihost × --device_augment composition: each process feeds its
    video shard as uint8 ROI windows, the deterministic test recipe runs
    in the sharded forward (bit-identical to the host chain, PARITY #13)
    — so the 2-process DA run must reproduce the single-process
    HOST-chain numbers."""
    results = _two_process_dense_test(tmp_path, ["--device_augment"])
    assert results[0] == results[1], results

    loss, top1 = _single_process_dense_test(tmp_path)
    np.testing.assert_allclose(results[0]["loss"], loss, rtol=1e-4)
    np.testing.assert_allclose(results[0]["top1"], top1, rtol=1e-12)
