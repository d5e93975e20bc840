"""Parity tests: our functional JAX primitives vs PyTorch CPU semantics.

The reference is a PyTorch model; checkpoint-level parity requires our conv /
BN / LN / pool / GELU / resize arithmetic to match torch's exactly.  torch
(CPU) is available in the test environment, so we compare directly.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from rel_pose_tpu.nn.layers import (
    conv2d_apply, batchnorm_init, batchnorm_apply, layernorm_apply,
    linear_apply, max_pool_2d, gelu, mlp_apply,
)
from rel_pose_tpu.nn.resnet import resnet18_trunk_init, resnet18_trunk_apply
from rel_pose_tpu.nn.extractor import (
    residual_block_init, residual_block_apply,
)
from rel_pose_tpu.nn.init import trunc_normal
from rel_pose_tpu.ops.image import nearest_resize

RNG = np.random.default_rng(42)


def _rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


class TestConv:
    def test_conv2d_vs_torch(self):
        x = _rand(2, 3, 16, 16)
        w = _rand(8, 3, 3, 3)
        b = _rand(8)
        ours = np.asarray(conv2d_apply({"w": jnp.array(w), "b": jnp.array(b)},
                                       jnp.array(x), stride=2, padding=1))
        ref = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                       stride=2, padding=1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_conv2d_k7(self):
        x = _rand(1, 3, 32, 32)
        w = _rand(4, 3, 7, 7)
        ours = np.asarray(conv2d_apply({"w": jnp.array(w)}, jnp.array(x),
                                       stride=2, padding=3))
        ref = F.conv2d(torch.tensor(x), torch.tensor(w), stride=2,
                       padding=3).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_conv2d_k5_nopad(self):
        x = _rand(1, 4, 28, 28)
        w = _rand(6, 4, 5, 5)
        ours = np.asarray(conv2d_apply({"w": jnp.array(w)}, jnp.array(x)))
        ref = F.conv2d(torch.tensor(x), torch.tensor(w)).numpy()
        assert ours.shape == (1, 6, 24, 24)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestBatchNorm:
    def test_eval_mode(self):
        x = _rand(4, 8, 5, 5)
        params, state = batchnorm_init(8)
        scale, bias = _rand(8), _rand(8)
        rmean, rvar = _rand(8), np.abs(_rand(8)) + 0.5
        params = {"scale": jnp.array(scale), "bias": jnp.array(bias)}
        state = {"mean": jnp.array(rmean), "var": jnp.array(rvar),
                 "count": jnp.zeros((), jnp.int32)}
        ours, _ = batchnorm_apply(params, state, jnp.array(x), training=False)
        bn = torch.nn.BatchNorm2d(8).eval()
        with torch.no_grad():
            bn.weight.copy_(torch.tensor(scale))
            bn.bias.copy_(torch.tensor(bias))
            bn.running_mean.copy_(torch.tensor(rmean))
            bn.running_var.copy_(torch.tensor(rvar))
            ref = bn(torch.tensor(x)).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)

    def test_train_mode_and_running_stats(self):
        x = _rand(4, 8, 5, 5)
        scale, bias = _rand(8), _rand(8)
        params = {"scale": jnp.array(scale), "bias": jnp.array(bias)}
        state = {"mean": jnp.zeros(8), "var": jnp.ones(8),
                 "count": jnp.zeros((), jnp.int32)}
        ours, new_state = batchnorm_apply(params, state, jnp.array(x),
                                          training=True)
        bn = torch.nn.BatchNorm2d(8).train()
        with torch.no_grad():
            bn.weight.copy_(torch.tensor(scale))
            bn.bias.copy_(torch.tensor(bias))
            ref = bn(torch.tensor(x)).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)
        np.testing.assert_allclose(np.asarray(new_state["mean"]),
                                   bn.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_state["var"]),
                                   bn.running_var.numpy(), atol=1e-4)


class TestMisc:
    def test_maxpool_vs_torch(self):
        x = _rand(2, 4, 11, 11)
        ours = np.asarray(max_pool_2d(jnp.array(x), 3, 2, 1))
        ref = F.max_pool2d(torch.tensor(x), 3, 2, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_layernorm_vs_torch(self):
        x = _rand(2, 5, 16)
        scale, bias = _rand(16), _rand(16)
        ours = np.asarray(layernorm_apply(
            {"scale": jnp.array(scale), "bias": jnp.array(bias)},
            jnp.array(x)))
        ref = F.layer_norm(torch.tensor(x), (16,), torch.tensor(scale),
                           torch.tensor(bias), eps=1e-6).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_gelu_vs_torch(self):
        x = _rand(100)
        ours = np.asarray(gelu(jnp.array(x)))
        ref = F.gelu(torch.tensor(x)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_linear_vs_torch(self):
        x, w, b = _rand(3, 10), _rand(5, 10), _rand(5)
        ours = np.asarray(linear_apply(
            {"w": jnp.array(w.T), "b": jnp.array(b)}, jnp.array(x)))
        ref = F.linear(torch.tensor(x), torch.tensor(w),
                       torch.tensor(b)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_nearest_resize_vs_torch(self):
        # all the resize shapes the reference actually uses
        for in_hw, out_hw in [((384, 512), (224, 224)),
                              ((480, 640), (384, 512)),
                              ((256, 256), (224, 224)),
                              ((100, 80), (50, 60))]:
            x = _rand(2, 3, *in_hw)
            ours = np.asarray(nearest_resize(jnp.array(x), out_hw))
            ref = F.interpolate(torch.tensor(x), size=list(out_hw)).numpy()
            np.testing.assert_allclose(ours, ref, atol=0)

    def test_trunc_normal_stats(self):
        key = jax.random.PRNGKey(0)
        # timm semantics: a=-2, b=2 are ABSOLUTE cutoffs; with std=0.02 the
        # truncation is ~100 sigma out, i.e. effectively a plain normal.
        x = np.asarray(trunc_normal(key, (20000,), std=0.02))
        assert np.abs(x).max() <= 2.0
        assert abs(float(x.std()) - 0.02) < 0.002
        # and with std=1 the cutoffs actually bite
        y = np.asarray(trunc_normal(key, (20000,)))
        assert np.abs(y).max() <= 2.0 + 1e-6
        assert abs(float(y.std()) - 0.8796) < 0.02


class TestResNetTrunk:
    def test_matches_torchvision_arch(self):
        """Build the same trunk in raw torch (stem + 4 BasicBlocks), copy our
        random weights into it, and compare outputs in eval mode."""
        key = jax.random.PRNGKey(1)
        params, state = resnet18_trunk_init(key)
        x = _rand(2, 3, 224, 224)
        ours, _ = resnet18_trunk_apply(params, state, jnp.array(x),
                                       training=False)
        assert ours.shape == (2, 128, 28, 28)

        import torch.nn as nn

        class BasicBlock(nn.Module):
            def __init__(self, inp, out, stride):
                super().__init__()
                self.conv1 = nn.Conv2d(inp, out, 3, stride, 1, bias=False)
                self.bn1 = nn.BatchNorm2d(out)
                self.conv2 = nn.Conv2d(out, out, 3, 1, 1, bias=False)
                self.bn2 = nn.BatchNorm2d(out)
                self.down = None
                if stride != 1 or inp != out:
                    self.down = nn.Sequential(
                        nn.Conv2d(inp, out, 1, stride, bias=False),
                        nn.BatchNorm2d(out))

            def forward(self, x):
                y = torch.relu(self.bn1(self.conv1(x)))
                y = self.bn2(self.conv2(y))
                idt = self.down(x) if self.down is not None else x
                return torch.relu(idt + y)

        class Trunk(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
                self.bn1 = nn.BatchNorm2d(64)
                self.maxpool = nn.MaxPool2d(3, 2, 1)
                self.l10 = BasicBlock(64, 64, 1)
                self.l11 = BasicBlock(64, 64, 1)
                self.l20 = BasicBlock(64, 128, 2)
                self.l21 = BasicBlock(128, 128, 1)

            def forward(self, x):
                x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
                return self.l21(self.l20(self.l11(self.l10(x))))

        trunk = Trunk().eval()

        def copy_bn(tm, p, s):
            with torch.no_grad():
                tm.weight.copy_(torch.tensor(np.asarray(p["scale"])))
                tm.bias.copy_(torch.tensor(np.asarray(p["bias"])))
                tm.running_mean.copy_(torch.tensor(np.asarray(s["mean"])))
                tm.running_var.copy_(torch.tensor(np.asarray(s["var"])))

        def copy_block(tb, p, s):
            with torch.no_grad():
                tb.conv1.weight.copy_(torch.tensor(np.asarray(p["conv1"]["w"])))
                tb.conv2.weight.copy_(torch.tensor(np.asarray(p["conv2"]["w"])))
            copy_bn(tb.bn1, p["bn1"], s["bn1"])
            copy_bn(tb.bn2, p["bn2"], s["bn2"])
            if tb.down is not None:
                with torch.no_grad():
                    tb.down[0].weight.copy_(
                        torch.tensor(np.asarray(p["downsample_conv"]["w"])))
                copy_bn(tb.down[1], p["downsample_bn"], s["downsample_bn"])

        with torch.no_grad():
            trunk.conv1.weight.copy_(
                torch.tensor(np.asarray(params["conv1"]["w"])))
        copy_bn(trunk.bn1, params["bn1"], state["bn1"])
        copy_block(trunk.l10, params["layer1_0"], state["layer1_0"])
        copy_block(trunk.l11, params["layer1_1"], state["layer1_1"])
        copy_block(trunk.l20, params["layer2_0"], state["layer2_0"])
        copy_block(trunk.l21, params["layer2_1"], state["layer2_1"])

        with torch.no_grad():
            ref = trunk(torch.tensor(x)).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3)


class TestExtractorBlock:
    def test_shapes_and_torch_parity(self):
        key = jax.random.PRNGKey(2)
        params, state = residual_block_init(key, 128, 192, 5)
        x = _rand(2, 128, 28, 28)
        ours, _ = residual_block_apply(params, state, jnp.array(x),
                                       training=False)
        assert ours.shape == (2, 192, 24, 24)

        import torch.nn as nn
        conv1 = nn.Conv2d(128, 192, 3, padding=1)
        conv2 = nn.Conv2d(192, 192, 5)
        down = nn.Conv2d(128, 192, 5)
        bns = [nn.BatchNorm2d(192).eval() for _ in range(3)]
        with torch.no_grad():
            conv1.weight.copy_(torch.tensor(np.asarray(params["conv1"]["w"])))
            conv1.bias.copy_(torch.tensor(np.asarray(params["conv1"]["b"])))
            conv2.weight.copy_(torch.tensor(np.asarray(params["conv2"]["w"])))
            conv2.bias.copy_(torch.tensor(np.asarray(params["conv2"]["b"])))
            down.weight.copy_(
                torch.tensor(np.asarray(params["downsample_conv"]["w"])))
            down.bias.copy_(
                torch.tensor(np.asarray(params["downsample_conv"]["b"])))
            for bn, name in zip(bns, ["norm1", "norm2", "norm3"]):
                bn.weight.copy_(torch.tensor(np.asarray(params[name]["scale"])))
                bn.bias.copy_(torch.tensor(np.asarray(params[name]["bias"])))
                bn.running_mean.copy_(torch.tensor(np.asarray(state[name]["mean"])))
                bn.running_var.copy_(torch.tensor(np.asarray(state[name]["var"])))
            xt = torch.tensor(x)
            y = torch.relu(bns[0](conv1(xt)))
            y = torch.relu(bns[1](conv2(y)))
            sc = bns[2](down(xt))
            ref = torch.relu(sc + y).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3)
