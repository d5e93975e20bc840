"""Checkpoint conversion tests: torch naming <-> our pytrees."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import torch

from rel_pose_tpu.config import ModelConfig
from rel_pose_tpu.models import vitess_init, vitess_forward
from rel_pose_tpu.utils.convert import (
    convert_torch_state_dict, export_torch_state_dict, load_torch_checkpoint,
)
from rel_pose_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, find_resume_checkpoint,
    checkpoint_path, ensure_output_dirs,
)


def trees_equal(a, b):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


class TestRoundTrip:
    def test_default_config(self):
        cfg = ModelConfig()
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        sd = export_torch_state_dict(params, state, cfg)
        p2, s2 = convert_torch_state_dict(sd, cfg)
        trees_equal(params, p2)
        # state trees match except count dtype normalization
        np.testing.assert_allclose(
            np.asarray(state["resnet"]["bn1"]["mean"]),
            np.asarray(s2["resnet"]["bn1"]["mean"]))

    def test_reference_key_names_present(self):
        cfg = ModelConfig()
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        sd = export_torch_state_dict(params, state, cfg)
        # spot-check names & shapes the reference checkpoints contain
        assert sd["resnet.conv1.weight"].shape == (64, 3, 7, 7)
        assert sd["resnet.layer2.0.downsample.0.weight"].shape == (128, 64, 1, 1)
        assert sd["resnet.bn1.running_mean"].shape == (64,)
        assert sd["extractor_final_conv.conv2.weight"].shape == (192, 192, 5, 5)
        assert sd["fusion_transformer.pos_embed"].shape == (1, 576, 192)
        assert sd["fusion_transformer.blocks.0.attn.qkv.weight"].shape == (576, 192)
        assert sd["fusion_transformer.blocks.5.cross_attn.proj_fundamental.weight"].shape == (192, 210)
        assert sd["fusion_transformer.norm.weight"].shape == (192,)
        assert sd["pose_regressor.0.weight"].shape == (512, 26880)
        assert sd["pose_regressor.4.bias"].shape == (14,)

    def test_module_prefix_stripped(self):
        cfg = ModelConfig()
        params, state = vitess_init(jax.random.PRNGKey(1), cfg)
        sd = export_torch_state_dict(params, state, cfg)
        sd_pref = {"module." + k: v for k, v in sd.items()}
        p2, _ = convert_torch_state_dict(sd_pref, cfg)
        trees_equal(params, p2)

    def test_noess_and_nofusion_variants(self):
        for cfg in (ModelConfig(noess=True),
                    ModelConfig(fusion_transformer=False)):
            params, state = vitess_init(jax.random.PRNGKey(2), cfg)
            sd = export_torch_state_dict(params, state, cfg)
            p2, s2 = convert_torch_state_dict(sd, cfg)
            trees_equal(params, p2)

    def test_load_torch_pth_file(self, tmp_path):
        """Full path: save a torch-style .pth, load via converter, forward."""
        cfg = ModelConfig()
        params, state = vitess_init(jax.random.PRNGKey(3), cfg)
        sd = {k: torch.tensor(v) for k, v in
              export_torch_state_dict(params, state, cfg).items()}
        path = str(tmp_path / "ckpt.pth")
        torch.save({"model": sd, "optimizer": {}}, path)
        p2, s2 = load_torch_checkpoint(path, cfg)
        trees_equal(params, p2)
        imgs = jnp.zeros((1, 2, 3, 384, 512))
        intr = jnp.tile(jnp.array([[517.97, 517.97, 320, 240]]), (1, 2, 1))[None]
        poses1, _ = vitess_forward(params, state, cfg, imgs, intr[0][None][0])
        # converted weights produce identical outputs
        poses2, _ = vitess_forward(p2, s2, cfg, imgs, intr[0][None][0])
        np.testing.assert_allclose(np.asarray(poses1), np.asarray(poses2),
                                   atol=1e-6)


class TestNativeCheckpoints:
    def test_save_load_roundtrip(self, tmp_path):
        cfg = ModelConfig(transformer_depth=2)
        params, state = vitess_init(jax.random.PRNGKey(0), cfg)
        tree = {"params": params, "bn_state": state, "step": 123}
        path = str(tmp_path / "x.ckpt")
        save_checkpoint(path, tree)
        template = {"params": jax.tree.map(np.zeros_like, params),
                    "bn_state": jax.tree.map(np.zeros_like, state),
                    "step": 0}
        loaded = load_checkpoint(path, template)
        assert loaded["step"] == 123
        trees_equal(loaded["params"], params)

    def test_auto_resume_discovery(self, tmp_path):
        out = str(tmp_path)
        ensure_output_dirs("exp", out)
        assert find_resume_checkpoint("exp", out) is None
        for step in (10000, 20000):
            save_checkpoint(checkpoint_path("exp", step, out), {"step": step})
        found = find_resume_checkpoint("exp", out)
        assert found.endswith("020000.ckpt")


class TestTorchvisionTrunk:
    def test_pretrained_trunk_forward_parity(self, tmp_path):
        """convert_torchvision_resnet18 must reproduce the torch trunk's
        eval forward (conv1 -> bn -> relu -> maxpool -> layer1 -> layer2)
        — the reference's models.resnet18(pretrained=True) init path."""
        from test_reference_parity import _ResNet18
        from rel_pose_tpu.utils.convert import load_torchvision_resnet18
        from rel_pose_tpu.nn.resnet import resnet18_trunk_apply

        torch.manual_seed(3)
        net = _ResNet18().eval()
        # make BN running stats non-trivial
        with torch.no_grad():
            for m in net.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.5, 1.5)
        path = str(tmp_path / "resnet18.pth")
        torch.save(net.state_dict(), path)

        params, state = load_torchvision_resnet18(path)
        x = np.random.default_rng(0).standard_normal(
            (2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            t = net.relu(net.bn1(net.conv1(torch.from_numpy(x))))
            t = net.maxpool(t)
            t = net.layer2(net.layer1(t)).numpy()
        ours, _ = resnet18_trunk_apply(params, state, jnp.asarray(x),
                                       training=False)
        np.testing.assert_allclose(np.asarray(ours), t, atol=2e-5)

    def test_wrapper_and_module_prefix(self, tmp_path):
        from test_reference_parity import _ResNet18
        from rel_pose_tpu.utils.convert import load_torchvision_resnet18
        net = _ResNet18()
        sd = {"module." + k: v for k, v in net.state_dict().items()}
        path = str(tmp_path / "wrapped.pth")
        torch.save({"state_dict": sd}, path)
        params, state = load_torchvision_resnet18(path)
        np.testing.assert_allclose(
            np.asarray(params["conv1"]["w"]),
            net.state_dict()["conv1.weight"].numpy(), atol=0)
        assert state["bn1"]["count"].dtype == jnp.int32
