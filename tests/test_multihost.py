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
