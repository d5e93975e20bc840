"""Equivalence tests for the essential-block single-kernel backward."""

import numpy as np
import jax
import jax.numpy as jnp

from rel_pose_tpu.ops.pallas_essential_block import (
    essential_block_reference,
)
from rel_pose_tpu.ops.pallas_essential_block_bwd import (
    essential_block_bwd_call,
)

RNG = np.random.default_rng(55)
B, N, H, D = 2, 64, 3, 32
C3 = 3 * H * D


def _rand(*shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32) * 0.5)


class TestEssentialBlockBwdKernel:
    def _check(self, cross=False, single=False, pos=True):
        qkv1, qkv2 = _rand(B, N, C3), _rand(B, N, C3)
        positional = _rand(B, N, 6) if pos else jnp.zeros((B, N, 6))
        e = D + (6 if pos else 0)
        df = _rand(B, 2, H, e, e)

        dq1, dq2, dp = essential_block_bwd_call(
            qkv1, qkv2, positional, df, H, cross, single, has_pos=pos,
            interpret=True)

        def loss(a, b, p):
            return jnp.sum(essential_block_reference(
                a, b, p if pos else None, H, cross_features=cross,
                use_single_softmax=single) * df)

        r1, r2, rp = jax.grad(loss, argnums=(0, 1, 2))(qkv1, qkv2,
                                                       positional)
        np.testing.assert_allclose(np.asarray(dq1), np.asarray(r1),
                                   atol=5e-4, err_msg="dqkv1")
        np.testing.assert_allclose(np.asarray(dq2), np.asarray(r2),
                                   atol=5e-4, err_msg="dqkv2")
        if pos:
            np.testing.assert_allclose(np.asarray(dp), np.asarray(rp),
                                       atol=5e-4, err_msg="dpos")

    def test_default(self):
        self._check()

    def test_bfloat16(self):
        """Speed-mode dtype: kernel gradients must track autodiff through
        the reference at bf16-level accuracy (cosine/normrel gates)."""
        qkv1 = _rand(B, N, C3).astype(jnp.bfloat16)
        qkv2 = _rand(B, N, C3).astype(jnp.bfloat16)
        positional = _rand(B, N, 6).astype(jnp.bfloat16)
        e = D + 6
        df = _rand(B, 2, H, e, e)
        dq1, dq2, dp = essential_block_bwd_call(
            qkv1, qkv2, positional, df, H, False, False, has_pos=True,
            interpret=True)

        def loss(a, b, p):
            return jnp.sum(essential_block_reference(
                a, b, p, H, cross_features=False,
                use_single_softmax=False).astype(jnp.float32) * df)

        refs = jax.grad(loss, argnums=(0, 1, 2))(qkv1, qkv2, positional)
        for got, ref, name in zip((dq1, dq2, dp), refs,
                                  ("dqkv1", "dqkv2", "dpos")):
            a = np.asarray(got, np.float64).ravel()
            b = np.asarray(ref, np.float64).ravel()
            cos = a @ b / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-30)
            nrel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)
            assert cos > 0.999 and nrel < 5e-2, (name, cos, nrel)

    def test_cross_features(self):
        self._check(cross=True)

    def test_single_softmax(self):
        self._check(single=True)

    def test_no_pos(self):
        self._check(pos=False)

    def test_cross_single_combo(self):
        self._check(cross=True, single=True)
