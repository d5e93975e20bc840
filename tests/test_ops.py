"""Tests for ops: positional encodings and the essential-matrix attention.

The positional-encoding oracle below is an independent numpy construction of
the documented table semantics (token order t = k*w + j, K^-1 unprojection,
quadratic features) used to validate the vectorized JAX implementation.
The essential-attention test validates the full einsum chain against a
step-by-step torch computation with identical weights.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from rel_pose_tpu.ops.posenc import (
    quadratic_positional_encoding, l1_positional_encoding,
)
from rel_pose_tpu.ops.essential import (
    cross_attention_init, essential_cross_attention, noess_cross_attention,
    dual_softmax,
)
from rel_pose_tpu.ops.image import scale_intrinsics

RNG = np.random.default_rng(3)


def oracle_posenc(B, N, intrinsics, quadratic=True):
    """Independent numpy oracle for the positional table (loop form)."""
    h, w = (24, 24) if N == 576 else (48, 64)
    ys = np.linspace(-1, 1, h)
    xs = np.linspace(-1, 1, w)
    p3 = np.tile(ys, w)[None].repeat(B, 0)
    p4 = np.repeat(xs, h)[None].repeat(B, 0)
    if intrinsics is not None:
        fx, fy, cx, cy = intrinsics[:, 0].T
        fx_n, cx_n = fx / cx, np.zeros_like(cx)
        fy_n, cy_n = fy / cy, np.zeros_like(cy)
        # general form: cx_n = (cx / (2*cx)) * 2 - 1 = 0, etc.
        K = np.zeros((B, 3, 3))
        K[:, 0, 0], K[:, 1, 1] = fx_n, fy_n
        K[:, 0, 2], K[:, 1, 2] = cx_n, cy_n
        K[:, 2, 2] = 1
        Kinv = np.linalg.inv(K)
        for j in range(h):
            for k in range(w):
                v = Kinv @ np.array([xs[k], ys[j], 1.0])
                p3[:, k * w + j] = v[:, 1] / v[:, 2]
                p4[:, k * w + j] = v[:, 0] / v[:, 2]
    out = np.ones((B, N, 6))
    if quadratic:
        out[:, :, 0] = p3 * p3
        out[:, :, 1] = p4 * p4
        out[:, :, 2] = p3 * p4
    out[:, :, 3] = p3
    out[:, :, 4] = p4
    return out


class TestPosEnc:
    def test_quadratic_matterport_intrinsics(self):
        # matterport intrinsics scaled to the 24x24 grid as the model does
        intr = np.array([[[517.97, 517.97, 320, 240],
                          [517.97, 517.97, 320, 240]]], dtype=np.float32)
        intr_scaled = np.asarray(scale_intrinsics(
            jnp.array(intr), (480, 640)))
        ours = np.asarray(quadratic_positional_encoding(
            576, jnp.array(intr_scaled)))
        ref = oracle_posenc(1, 576, intr_scaled)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_quadratic_no_intrinsics(self):
        ours = np.asarray(quadratic_positional_encoding(576, None, batch=2))
        ref = oracle_posenc(2, 576, None)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_l1(self):
        intr = np.array([[[128, 128, 128, 128], [128, 128, 128, 128]]],
                        dtype=np.float32)
        intr_scaled = np.asarray(scale_intrinsics(jnp.array(intr), (256, 256)))
        ours = np.asarray(l1_positional_encoding(576, jnp.array(intr_scaled)))
        ref = oracle_posenc(1, 576, intr_scaled, quadratic=False)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_48x64_grid_no_intrinsics(self):
        # the non-square grid works without intrinsics (tile/repeat init)
        ours = np.asarray(quadratic_positional_encoding(48 * 64, None,
                                                        batch=1))
        ref = oracle_posenc(1, 48 * 64, None)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_48x64_grid_with_intrinsics_raises(self):
        # the reference's unprojection loop IndexErrors on non-square grids;
        # we raise a clear ValueError instead of silently mis-scattering.
        import pytest
        intr = np.array([[[200.0, 210.0, 120.0, 100.0],
                          [200.0, 210.0, 120.0, 100.0]]], dtype=np.float32)
        with pytest.raises(ValueError):
            quadratic_positional_encoding(48 * 64, jnp.array(intr))


class TestDualSoftmax:
    def test_vs_torch(self):
        a = RNG.standard_normal((2, 3, 10, 10)).astype(np.float32)
        ours = np.asarray(dual_softmax(jnp.array(a)))
        at = torch.tensor(a)
        ref = (at.softmax(dim=-1) * at.softmax(dim=-2)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def _torch_essential(qkv_w, qkv_b, proj_w, proj_b, x1, x2, pos, num_heads,
                     cross_features=False, single_softmax=False):
    """Step-by-step torch computation of the essential-matrix attention with
    the same weights (follows the published equations, not the ref code)."""
    B, N, C = x1.shape
    d = C // num_heads

    def heads(x):
        qkv = torch.nn.functional.linear(x, qkv_w, qkv_b)
        qkv = qkv.reshape(B, N, 3, num_heads, d).permute(2, 0, 3, 1, 4)
        return qkv[0], qkv[1], qkv[2]

    q1, k1, v1 = heads(x1)
    q2, k2, v2 = heads(x2)
    scale = d ** -0.5
    a1 = (q2 @ k1.transpose(-2, -1)) * scale
    a2 = (q1 @ k2.transpose(-2, -1)) * scale
    if single_softmax:
        a1 = a1.softmax(-1)
        a2 = a2.softmax(-1)
    else:
        a1 = a1.softmax(-1) * a1.softmax(-2)
        a2 = a2.softmax(-1) * a2.softmax(-2)
    if pos is not None:
        p = pos.unsqueeze(1).repeat(1, num_heads, 1, 1)
        v1 = torch.cat([v1, p], dim=3)
        v2 = torch.cat([v2, p], dim=3)
    if cross_features:
        f1 = (v2.transpose(-2, -1) @ a1) @ v1
        f2 = (v1.transpose(-2, -1) @ a2) @ v2
    else:
        f1 = (v1.transpose(-2, -1) @ a1) @ v1
        f2 = (v2.transpose(-2, -1) @ a2) @ v2
    e = f1.shape[-1]
    f1 = f1.reshape(B, num_heads * e, e).transpose(-2, -1)
    f2 = f2.reshape(B, num_heads * e, e).transpose(-2, -1)
    f1 = torch.nn.functional.linear(f1, proj_w, proj_b)
    f2 = torch.nn.functional.linear(f2, proj_w, proj_b)
    return f2, f1  # flipped


class TestEssentialAttention:
    def _setup(self, no_pos=False):
        C, h, N, B = 192, 3, 576, 2
        key = jax.random.PRNGKey(0)
        params = cross_attention_init(key, C, h, no_pos_encoding=no_pos)
        x1 = RNG.standard_normal((B, N, C)).astype(np.float32) * 0.5
        x2 = RNG.standard_normal((B, N, C)).astype(np.float32) * 0.5
        pos = None if no_pos else \
            RNG.standard_normal((B, N, 6)).astype(np.float32)
        return params, x1, x2, pos, C, h

    def _torch_weights(self, params):
        qkv_w = torch.tensor(np.asarray(params["qkv"]["w"]).T)
        qkv_b = torch.tensor(np.asarray(params["qkv"]["b"]))
        pw = torch.tensor(np.asarray(params["proj_fundamental"]["w"]).T)
        pb = torch.tensor(np.asarray(params["proj_fundamental"]["b"]))
        return qkv_w, qkv_b, pw, pb

    def test_default_path(self):
        params, x1, x2, pos, C, h = self._setup()
        o1, o2 = essential_cross_attention(params, jnp.array(x1),
                                           jnp.array(x2), jnp.array(pos), h)
        r1, r2 = _torch_essential(*self._torch_weights(params),
                                  torch.tensor(x1), torch.tensor(x2),
                                  torch.tensor(pos), h)
        assert o1.shape == (2, 70, 192)
        np.testing.assert_allclose(np.asarray(o1), r1.numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(o2), r2.numpy(), atol=2e-3)

    def test_cross_features(self):
        params, x1, x2, pos, C, h = self._setup()
        o1, o2 = essential_cross_attention(params, jnp.array(x1),
                                           jnp.array(x2), jnp.array(pos), h,
                                           cross_features=True)
        r1, r2 = _torch_essential(*self._torch_weights(params),
                                  torch.tensor(x1), torch.tensor(x2),
                                  torch.tensor(pos), h, cross_features=True)
        np.testing.assert_allclose(np.asarray(o1), r1.numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(o2), r2.numpy(), atol=2e-3)

    def test_single_softmax(self):
        params, x1, x2, pos, C, h = self._setup()
        o1, o2 = essential_cross_attention(params, jnp.array(x1),
                                           jnp.array(x2), jnp.array(pos), h,
                                           use_single_softmax=True)
        r1, r2 = _torch_essential(*self._torch_weights(params),
                                  torch.tensor(x1), torch.tensor(x2),
                                  torch.tensor(pos), h, single_softmax=True)
        np.testing.assert_allclose(np.asarray(o1), r1.numpy(), atol=2e-3)

    def test_no_pos_encoding(self):
        params, x1, x2, pos, C, h = self._setup(no_pos=True)
        o1, o2 = essential_cross_attention(params, jnp.array(x1),
                                           jnp.array(x2), None, h)
        assert o1.shape == (2, 64, 192)
        r1, r2 = _torch_essential(*self._torch_weights(params),
                                  torch.tensor(x1), torch.tensor(x2),
                                  None, h)
        np.testing.assert_allclose(np.asarray(o1), r1.numpy(), atol=2e-3)

    def test_noess_path(self):
        C, h, N, B = 192, 3, 64, 2
        key = jax.random.PRNGKey(1)
        params = cross_attention_init(key, C, h, noess=True)
        x1 = RNG.standard_normal((B, N, C)).astype(np.float32) * 0.5
        x2 = RNG.standard_normal((B, N, C)).astype(np.float32) * 0.5
        o1, o2 = noess_cross_attention(params, jnp.array(x1), jnp.array(x2), h)
        assert o1.shape == (B, N, C)
        # torch mimic
        qkv_w = torch.tensor(np.asarray(params["qkv"]["w"]).T)
        qkv_b = torch.tensor(np.asarray(params["qkv"]["b"]))
        pw = torch.tensor(np.asarray(params["proj"]["w"]).T)
        pb = torch.tensor(np.asarray(params["proj"]["b"]))
        d = C // h

        def heads(x):
            qkv = torch.nn.functional.linear(x, qkv_w, qkv_b)
            qkv = qkv.reshape(B, N, 3, h, d).permute(2, 0, 3, 1, 4)
            return qkv[0], qkv[1], qkv[2]

        q1, k1, v1 = heads(torch.tensor(x1))
        q2, k2, v2 = heads(torch.tensor(x2))
        scale = d ** -0.5
        y1 = ((q2 @ k1.transpose(-2, -1)) * scale).softmax(-1) @ v1
        y1 = y1.transpose(1, 2).reshape(B, N, C)
        y2 = ((q1 @ k2.transpose(-2, -1)) * scale).softmax(-1) @ v2
        y2 = y2.transpose(1, 2).reshape(B, N, C)
        y1 = torch.nn.functional.linear(y1, pw, pb)
        y2 = torch.nn.functional.linear(y2, pw, pb)
        np.testing.assert_allclose(np.asarray(o1), y2.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(o2), y1.numpy(), atol=1e-4)


class TestImageOps:
    def test_preprocess_matches_reference_arithmetic(self):
        """BGR->RGB flip + /255 + ImageNet normalize, vs the same chain in
        torch (mirrors src/model.py:115-118)."""
        import torch
        from rel_pose_tpu.ops.image import preprocess_images
        x = RNG.uniform(0, 255, (2, 3, 8, 10)).astype(np.float32)
        ours = np.asarray(preprocess_images(jnp.array(x)))
        xt = torch.tensor(x)[:, [2, 1, 0]] / 255.0
        mean = torch.tensor([0.485, 0.456, 0.406])
        std = torch.tensor([0.229, 0.224, 0.225])
        ref = ((xt - mean[:, None, None]) / std[:, None, None]).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_scale_intrinsics(self):
        from rel_pose_tpu.ops.image import scale_intrinsics
        intr = jnp.array([[517.97, 517.97, 320.0, 240.0]])
        out = np.asarray(scale_intrinsics(intr, (1, 2, 3, 480, 640),
                                          (24, 24)))
        np.testing.assert_allclose(out[0, 0], 517.97 * 24 / 640, rtol=1e-6)
        np.testing.assert_allclose(out[0, 1], 517.97 * 24 / 480, rtol=1e-6)
        np.testing.assert_allclose(out[0, 2], 320 * 24 / 640, rtol=1e-6)
        np.testing.assert_allclose(out[0, 3], 240 * 24 / 480, rtol=1e-6)
