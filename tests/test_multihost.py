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


def test_two_process_eval_cli(tmp_path):
    """The pod eval path: 2 processes each evaluate a strided shard of the
    test set on their local devices, predictions all-gather, process 0
    writes results.txt — metrics must equal the single-process run's."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_cli import make_matterport_tree
    make_matterport_tree(str(tmp_path / "matterport"), n=6, hw=(120, 160))

    # weights-only checkpoint at the worker's model flags
    env0 = dict(os.environ)
    env0["PYTHONPATH"] = REPO + os.pathsep + env0.get("PYTHONPATH", "")
    env0["RELPOSE_PLATFORM"] = "cpu"
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

    # single-process baseline
    base = subprocess.run(
        [sys.executable, os.path.join(REPO, "test_matterport.py"),
         "--exp", "expsp", "--datapath", str(tmp_path / "matterport"),
         "--ckpt", str(tmp_path / "init.ckpt"),
         "--transformer_depth", "2", "--fusion_transformer", "--batch", "2"],
        capture_output=True, text=True, env=env0, cwd=str(tmp_path),
        timeout=540)
    assert base.returncode == 0, base.stdout + base.stderr
    ref = _read_results(
        str(tmp_path / "output" / "expsp" / "matterport_test" /
            "results.txt"))
    assert ref

    # 2-process run
    port = _free_port()
    env = dict(env0)
    env.pop("XLA_FLAGS", None)
    env.pop("RELPOSE_PLATFORM", None)
    worker = os.path.join(REPO, "tests", "multihost_eval_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), "2", str(tmp_path)],
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

    got = _read_results(
        str(tmp_path / "output" / "expmh" / "matterport_test" /
            "results.txt"))
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], rel=1e-4, abs=1e-4), \
            (k, got[k], ref[k])
