"""Driver-entry-point coverage: ``dryrun_multichip`` must be self-contained
(force its own virtual CPU mesh — round-1 failure mode was inheriting the
sandbox's real-TPU platform), and multi-host init must fire on the standard
Cloud TPU pod env markers, not just a custom coordinator var.

Reference axis validated: DDP data parallelism
(``/root/reference/train.py:28-36,285-291``).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestDryrunMultichip:
    def test_self_contained_under_foreign_platform_env(self):
        """Run exactly as the driver does: fresh process, no XLA_FLAGS help,
        and a preset JAX_PLATFORMS pointing at an unavailable platform."""
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env["JAX_PLATFORMS"] = "axon"  # what the sandbox presets
        out = subprocess.run(
            [sys.executable, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(8)"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
        assert out.returncode == 0, out.stderr[-2000:]
        assert "dryrun_multichip(8): ok" in out.stdout, out.stdout

    def test_refuses_when_wrong_backend_already_live(self):
        """If a non-CPU backend is already initialized in-process, fail with
        a clear message instead of the round-1 libtpu crash."""
        import jax
        import pytest
        from __graft_entry__ import _force_cpu_mesh
        assert jax.default_backend() == "cpu"  # conftest forces CPU
        # CPU is live with 8 devices, so asking for more must refuse clearly.
        with pytest.raises(RuntimeError, match="CPU devices visible"):
            _force_cpu_mesh(16)


class TestMultihostDetection:
    def _detect(self, env, monkeypatch):
        from rel_pose_tpu.parallel.mesh import _multihost_env_detected
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
            monkeypatch.delenv(v, raising=False)
        for k, val in env.items():
            monkeypatch.setenv(k, val)
        return _multihost_env_detected()

    def test_single_host_no_markers(self, monkeypatch):
        assert not self._detect({}, monkeypatch)

    def test_single_host_pod_of_one(self, monkeypatch):
        assert not self._detect({"TPU_WORKER_HOSTNAMES": "t1v-0-w-0"},
                                monkeypatch)

    def test_cloud_tpu_pod(self, monkeypatch):
        assert self._detect(
            {"TPU_WORKER_HOSTNAMES": "t1v-0-w-0,t1v-0-w-1"}, monkeypatch)

    def test_explicit_coordinator(self, monkeypatch):
        assert self._detect(
            {"JAX_COORDINATOR_ADDRESS": "10.0.0.1:1234"}, monkeypatch)

    def test_megascale(self, monkeypatch):
        assert self._detect(
            {"MEGASCALE_COORDINATOR_ADDRESS": "10.0.0.1:8080"}, monkeypatch)

    def test_noop_returns_false(self, monkeypatch):
        from rel_pose_tpu.parallel import maybe_init_distributed
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
            monkeypatch.delenv(v, raising=False)
        assert maybe_init_distributed() is False
