"""Fused essential-block kernel equivalence tests (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from rel_pose_tpu.ops.pallas_essential_block import (
    essential_block_reference, _essential_block_call,
)

RNG = np.random.default_rng(33)
B, N, H, D = 2, 64, 3, 32
C3 = 3 * H * D


def _rand(*shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32) * 0.5)


class TestEssentialBlockKernel:
    def _check(self, cross=False, single=False, pos=True):
        qkv1, qkv2 = _rand(B, N, C3), _rand(B, N, C3)
        positional = _rand(B, N, 6) if pos else None
        ref = essential_block_reference(qkv1, qkv2, positional, H,
                                        cross_features=cross,
                                        use_single_softmax=single)
        p_arr = positional if pos else jnp.zeros((B, N, 6))
        out = _essential_block_call(qkv1, qkv2, p_arr, H, cross, single,
                                    has_pos=pos, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_default(self):
        self._check()

    def test_cross_features(self):
        self._check(cross=True)

    def test_single_softmax(self):
        self._check(single=True)

    def test_no_pos(self):
        self._check(pos=False)

    def test_mxu_norm_bf16_variant(self, monkeypatch):
        """RELPOSE_EB_MXU_NORM=1 (single-exp dual softmax, normalizers as
        bf16 MXU matvecs) must stay within bf16 resolution of the default
        bf16 chain and no farther from the fp32 reference."""
        qkv1 = _rand(B, N, C3).astype(jnp.bfloat16)
        qkv2 = _rand(B, N, C3).astype(jnp.bfloat16)
        positional = _rand(B, N, 6).astype(jnp.bfloat16)
        ref = np.asarray(essential_block_reference(
            qkv1, qkv2, positional, H, False, False))
        base = np.asarray(_essential_block_call(
            qkv1, qkv2, positional, H, False, False, True, interpret=True))
        monkeypatch.setenv("RELPOSE_EB_MXU_NORM", "1")
        var = np.asarray(_essential_block_call(
            qkv1, qkv2, positional, H, False, False, True, interpret=True))

        def rel(a, b):
            return np.abs(a - b).max() / np.abs(b).max()

        assert rel(var, base) < 0.01          # within bf16 noise of default
        assert rel(var, ref) < rel(base, ref) * 2 + 0.005

    def test_matches_per_head_path(self):
        """The block reference must agree with the older per-head einsum
        composition used by essential_cross_attention's previous wiring."""
        from rel_pose_tpu.ops.pallas_essential import (
            bilinear_attention_reference)
        qkv1, qkv2 = _rand(B, N, C3), _rand(B, N, C3)
        positional = _rand(B, N, 6)
        ref = np.asarray(essential_block_reference(qkv1, qkv2, positional, H))
        C = H * D

        def heads(qkv):
            q = np.asarray(qkv[:, :, :C]).reshape(B, N, H, D).transpose(0, 2, 1, 3)
            k = np.asarray(qkv[:, :, C:2 * C]).reshape(B, N, H, D).transpose(0, 2, 1, 3)
            v = np.asarray(qkv[:, :, 2 * C:]).reshape(B, N, H, D).transpose(0, 2, 1, 3)
            return q, k, v

        q1, k1, v1 = heads(qkv1)
        q2, k2, v2 = heads(qkv2)
        pos = np.broadcast_to(np.asarray(positional)[:, None], (B, H, N, 6))
        v1 = np.concatenate([v1, pos], axis=-1)
        v2 = np.concatenate([v2, pos], axis=-1)
        scale = D ** -0.5
        f1 = np.asarray(bilinear_attention_reference(
            jnp.asarray(q2.reshape(B * H, N, D)),
            jnp.asarray(k1.reshape(B * H, N, D)),
            jnp.asarray(v1.reshape(B * H, N, D + 6)),
            jnp.asarray(v1.reshape(B * H, N, D + 6)), scale))
        np.testing.assert_allclose(ref[:, 0].reshape(B * H, D + 6, D + 6),
                                   f1, atol=1e-4)

    def test_backward_grads_finite_and_match(self):
        qkv1, qkv2 = _rand(B, N, C3), _rand(B, N, C3)
        positional = _rand(B, N, 6)
        g = _rand(B, 2, H, D + 6, D + 6)

        from rel_pose_tpu.ops.pallas_essential_block import _eb_bwd
        dq1, dq2, dp = _eb_bwd(H, False, False, True,
                               (qkv1, qkv2, positional), g)

        def loss(a, b, p):
            return jnp.sum(essential_block_reference(a, b, p, H) * g)
        r1, r2, rp = jax.grad(loss, argnums=(0, 1, 2))(qkv1, qkv2, positional)
        np.testing.assert_allclose(np.asarray(dq1), np.asarray(r1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(dq2), np.asarray(r2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(rp), atol=1e-5)


class TestEssentialBlockXOp:
    """qkv-fused (token-level) variant: projection inside the kernel."""

    def _params(self):
        C = H * D
        w = _rand(C, 3 * C) * 0.2
        b = _rand(3 * C) * 0.1
        return {"w": w, "b": b}

    def _ref(self, p, x1, x2, positional, cross=False, single=False):
        qkv1 = jnp.dot(x1, p["w"]) + p["b"]
        qkv2 = jnp.dot(x2, p["w"]) + p["b"]
        return essential_block_reference(qkv1, qkv2, positional, H,
                                         cross_features=cross,
                                         use_single_softmax=single)

    def test_forward_kernel_matches(self):
        from rel_pose_tpu.ops.pallas_essential_block import (
            _essential_block_x_call)
        C = H * D
        p = self._params()
        x1, x2 = _rand(B, N, C), _rand(B, N, C)
        positional = _rand(B, N, 6)
        ref = self._ref(p, x1, x2, positional)
        out = _essential_block_x_call(x1, x2, p["w"], p["b"], positional, H,
                                      False, False, True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_forward_flag_paths(self):
        from rel_pose_tpu.ops.pallas_essential_block import (
            _essential_block_x_call)
        C = H * D
        p = self._params()
        x1, x2 = _rand(B, N, C), _rand(B, N, C)
        positional = _rand(B, N, 6)
        for cross, single, pos in [(True, False, True), (False, True, True),
                                   (False, False, False)]:
            ref = self._ref(p, x1, x2, positional if pos else None,
                            cross=cross, single=single)
            p_arr = positional if pos else jnp.zeros((B, N, 6))
            out = _essential_block_x_call(x1, x2, p["w"], p["b"], p_arr, H,
                                          cross, single, pos, interpret=True)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-4,
                err_msg=f"cross={cross} single={single} pos={pos}")

    def test_backward_matches_autodiff(self):
        from rel_pose_tpu.ops.pallas_essential_block import _ebx_bwd
        C = H * D
        p = self._params()
        x1, x2 = _rand(B, N, C), _rand(B, N, C)
        positional = _rand(B, N, 6)
        g = _rand(B, 2, H, D + 6, D + 6)

        dx1, dx2, dw, db, dp = _ebx_bwd(
            H, False, False, True, (x1, x2, p["w"], p["b"], positional), g)

        def loss(a, c, w, b, pos):
            qkv1 = jnp.dot(a, w) + b
            qkv2 = jnp.dot(c, w) + b
            return jnp.sum(
                essential_block_reference(qkv1, qkv2, pos, H) * g)

        r = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            x1, x2, p["w"], p["b"], positional)
        for got, want, name in [(dx1, r[0], "dx1"), (dx2, r[1], "dx2"),
                                (dw, r[2], "dw"), (db, r[3], "db"),
                                (dp, r[4], "dpos")]:
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=3e-5, err_msg=name)


class TestEssentialBlockPairOp:
    """LN-fused pair variant: norm1 + pair split + qkv inside the kernel."""

    def _params(self):
        C = H * D
        w = _rand(C, 3 * C) * 0.2
        b = _rand(3 * C) * 0.1
        lns = 1.0 + _rand(C) * 0.1
        lnb = _rand(C) * 0.1
        return {"w": w, "b": b}, lns, lnb

    def _ref(self, p, lns, lnb, xp, positional, cross=False, single=False):
        from rel_pose_tpu.nn.layers import layernorm_apply
        ln = {"scale": lns, "bias": lnb}
        y1 = layernorm_apply(ln, xp[:, 0])
        y2 = layernorm_apply(ln, xp[:, 1])
        qkv1 = jnp.dot(y1, p["w"]) + p["b"]
        qkv2 = jnp.dot(y2, p["w"]) + p["b"]
        return essential_block_reference(qkv1, qkv2, positional, H,
                                         cross_features=cross,
                                         use_single_softmax=single)

    def test_forward_kernel_matches(self):
        from rel_pose_tpu.ops.pallas_essential_block import (
            _essential_block_pair_call)
        C = H * D
        p, lns, lnb = self._params()
        xp = _rand(B, 2, N, C)
        positional = _rand(B, N, 6)
        ref = self._ref(p, lns, lnb, xp, positional)
        out = _essential_block_pair_call(xp, lns, lnb, p["w"], p["b"],
                                         positional, H, False, False, True,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_forward_flag_paths(self):
        from rel_pose_tpu.ops.pallas_essential_block import (
            _essential_block_pair_call)
        C = H * D
        p, lns, lnb = self._params()
        xp = _rand(B, 2, N, C)
        positional = _rand(B, N, 6)
        for cross, single, pos in [(True, False, True), (False, True, True),
                                   (False, False, False)]:
            ref = self._ref(p, lns, lnb, xp, positional if pos else None,
                            cross=cross, single=single)
            p_arr = positional if pos else jnp.zeros((B, N, 6))
            out = _essential_block_pair_call(xp, lns, lnb, p["w"], p["b"],
                                             p_arr, H, cross, single, pos,
                                             interpret=True)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-4,
                err_msg=f"cross={cross} single={single} pos={pos}")

    def test_backward_matches_autodiff(self):
        from rel_pose_tpu.ops.pallas_essential_block import _ebp_bwd
        from rel_pose_tpu.nn.layers import layernorm_apply
        C = H * D
        p, lns, lnb = self._params()
        xp = _rand(B, 2, N, C)
        positional = _rand(B, N, 6)
        g = _rand(B, 2, H, D + 6, D + 6)

        dxp, dlns, dlnb, dw, db, dp = _ebp_bwd(
            H, False, False, True,
            (xp, lns, lnb, p["w"], p["b"], positional), g)

        def loss(xx, s, bb, w, b, pos):
            ln = {"scale": s, "bias": bb}
            qkv1 = jnp.dot(layernorm_apply(ln, xx[:, 0]), w) + b
            qkv2 = jnp.dot(layernorm_apply(ln, xx[:, 1]), w) + b
            return jnp.sum(
                essential_block_reference(qkv1, qkv2, pos, H) * g)

        r = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
            xp, lns, lnb, p["w"], p["b"], positional)
        for got, want, name in [(dxp, r[0], "dxpair"), (dlns, r[1], "dlns"),
                                (dlnb, r[2], "dlnb"), (dw, r[3], "dw"),
                                (db, r[4], "db"), (dp, r[5], "dpos")]:
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=5e-5, err_msg=name)

    def test_public_op_gradients_interpret(self, monkeypatch):
        """Full custom-VJP path (fused bwd kernel) through interpret mode."""
        monkeypatch.setenv("RELPOSE_PALLAS_INTERPRET", "1")
        from rel_pose_tpu.ops.pallas_essential_block import (
            fused_essential_block_pair)
        from rel_pose_tpu.nn.layers import layernorm_apply as \
            layernorm_apply_ref
        C = H * D
        p, lns, lnb = self._params()
        xp = _rand(B, 2, N, C)
        positional = _rand(B, N, 6)
        g = _rand(B, 2, H, D + 6, D + 6)
        ln = {"scale": lns, "bias": lnb}

        def loss(xx, lp, qp, pos):
            return jnp.sum(fused_essential_block_pair(
                xx, lp, qp, pos, H).astype(jnp.float32) * g)

        out = jax.grad(loss, argnums=(0, 1, 2, 3))(
            xp, ln, {"w": p["w"], "b": p["b"]}, positional)

        def ref_loss(xx, lp, qp, pos):
            y1 = layernorm_apply_ref(lp, xx[:, 0])
            y2 = layernorm_apply_ref(lp, xx[:, 1])
            qkv1 = jnp.dot(y1, qp["w"]) + qp["b"]
            qkv2 = jnp.dot(y2, qp["w"]) + qp["b"]
            return jnp.sum(
                essential_block_reference(qkv1, qkv2, pos, H) * g)

        ref = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(
            xp, ln, {"w": p["w"], "b": p["b"]}, positional)
        for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)
