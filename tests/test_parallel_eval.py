"""Batch-sharded (data-parallel) inference over the virtual 8-device mesh +
converter CLI round trip."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import torch

from rel_pose_tpu.config import ModelConfig
from rel_pose_tpu.models import vitess_init
from rel_pose_tpu.parallel import make_mesh, shard_batch, replicate
from rel_pose_tpu.train.step import make_forward_fn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestShardedEval:
    def test_mesh_forward_matches_single(self):
        cfg = ModelConfig(transformer_depth=2)
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.uniform(0, 255, (8, 2, 3, 96, 128)).astype(np.float32))
        intr = jnp.asarray(np.tile(
            np.array([[517.97, 517.97, 320, 240]], np.float32), (8, 2, 1)))

        single = make_forward_fn(cfg)
        p_single = np.asarray(single(params, state, images, intr))

        mesh = make_mesh()
        fwd = make_forward_fn(cfg, mesh=mesh)
        pr, sr = replicate(mesh, (params, state))
        ims, ins = shard_batch(mesh, (images, intr))
        p_sharded = np.asarray(fwd(pr, sr, ims, ins))
        np.testing.assert_allclose(p_sharded, p_single, atol=1e-5)


class TestConverterCLI:
    def test_pth_to_ckpt_roundtrip(self, tmp_path):
        cfg = ModelConfig(transformer_depth=2)
        params, state = vitess_init(jax.random.PRNGKey(1), cfg)
        from rel_pose_tpu.utils.convert import export_torch_state_dict
        sd = {k: torch.tensor(v) for k, v in
              export_torch_state_dict(params, state, cfg).items()}
        pth = str(tmp_path / "model.pth")
        torch.save({"model": sd}, pth)
        out = str(tmp_path / "model.ckpt")

        env = dict(os.environ)
        env["RELPOSE_PLATFORM"] = "cpu"
        env["PYTHONPATH"] = env.get("PYTHONPATH", "") + os.pathsep + REPO
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "convert_checkpoint.py"),
             "--ckpt", pth, "--out", out, "--transformer_depth", "2"],
            env=env, capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.exists(out)
        assert "parameters" in r.stdout

        # the converted file loads via the inference path
        from rel_pose_tpu.train.checkpoint import load_params_only
        p2, s2 = load_params_only(out, params, state)
        np.testing.assert_allclose(
            np.asarray(p2["pose_regressor"]["fc1"]["w"]),
            np.asarray(params["pose_regressor"]["fc1"]["w"]))
