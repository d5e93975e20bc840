"""ViT-stack megakernel equivalence tests (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from rel_pose_tpu.nn.transformer import vit_block_init, vit_block_apply
from rel_pose_tpu.ops.pallas_vit import (
    stack_block_params, vit_stack_reference, _vit_stack_call,
)

RNG = np.random.default_rng(21)


def make_blocks(depth, dim, heads):
    key = jax.random.PRNGKey(0)
    return [vit_block_init(k, dim, heads)
            for k in jax.random.split(key, depth)]


class TestVitStackKernel:
    def test_reference_matches_unfused(self):
        dim, heads, depth = 96, 3, 2
        blocks = make_blocks(depth, dim, heads)
        x = jnp.asarray(RNG.standard_normal((2, 64, dim)).astype(np.float32))
        stacked = stack_block_params(blocks)
        ref = vit_stack_reference(x, stacked, depth, heads)
        direct = x
        for b in blocks:
            direct = vit_block_apply(b, direct, heads)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(direct),
                                   atol=1e-5)

    def test_kernel_matches_reference(self):
        dim, heads, depth = 96, 3, 3
        blocks = make_blocks(depth, dim, heads)
        x = jnp.asarray(
            RNG.standard_normal((3, 64, dim)).astype(np.float32) * 0.5)
        stacked = stack_block_params(blocks)
        ref = vit_stack_reference(x, stacked, depth, heads)
        out = _vit_stack_call(x, stacked, depth, heads, interpret=True)
        # fp32 kernel GELU is the A&S erf polynomial (|err| < 1.5e-7)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_kernel_production_shape(self):
        dim, heads, depth = 192, 3, 1
        blocks = make_blocks(depth, dim, heads)
        x = jnp.asarray(
            RNG.standard_normal((1, 576, dim)).astype(np.float32) * 0.5)
        stacked = stack_block_params(blocks)
        ref = vit_stack_reference(x, stacked, depth, heads)
        out = _vit_stack_call(x, stacked, depth, heads, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_kernel_packed_heads_matches_reference(self, monkeypatch):
        """RELPOSE_VIT_PACK_HEADS=1 (heads 0+1 block-diagonally packed into
        one 128-lane MXU tile) must be numerically identical to the default
        per-head chain — same softmax math modulo the shared row shift."""
        monkeypatch.setenv("RELPOSE_VIT_PACK_HEADS", "1")
        dim, heads, depth = 192, 3, 2
        blocks = make_blocks(depth, dim, heads)
        x = jnp.asarray(
            RNG.standard_normal((2, 64, dim)).astype(np.float32) * 0.5)
        stacked = stack_block_params(blocks)
        ref = vit_stack_reference(x, stacked, depth, heads)
        out = _vit_stack_call(x, stacked, depth, heads, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_kernel_seq2_matches_reference(self, monkeypatch):
        """RELPOSE_VIT_SEQ=2 (two row-fused sequences per grid instance —
        the round-2 S=2 lever re-exposed for an at-HEAD hardware A/B) must
        be numerically identical to S=1: the flattened (S*N, C) row-wise
        ops and the per-sequence attention loop compute the same math."""
        monkeypatch.setenv("RELPOSE_VIT_SEQ", "2")
        dim, heads, depth = 96, 3, 2
        blocks = make_blocks(depth, dim, heads)
        x = jnp.asarray(
            RNG.standard_normal((4, 64, dim)).astype(np.float32) * 0.5)
        stacked = stack_block_params(blocks)
        ref = vit_stack_reference(x, stacked, depth, heads)
        out = _vit_stack_call(x, stacked, depth, heads, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)
        # stash path (training forward) keeps the (depth, G, N, C) layout
        out2, xs = _vit_stack_call(x, stacked, depth, heads,
                                   interpret=True, stash=True)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(out),
                                   atol=1e-6)
        assert xs.shape == (depth, 4, 64, dim)
        np.testing.assert_allclose(np.asarray(xs[0]), np.asarray(x),
                                   atol=1e-6)

    def test_kernel_channels_first_matches_reference(self):
        """channels_first=True ((G, C, N) input, VMEM transpose) must equal
        the standard layout on the transposed input."""
        dim, heads, depth = 192, 3, 2
        blocks = make_blocks(depth, dim, heads)
        x = jnp.asarray(
            RNG.standard_normal((2, 64, dim)).astype(np.float32) * 0.5)
        stacked = stack_block_params(blocks)
        ref = vit_stack_reference(x, stacked, depth, heads)
        out = _vit_stack_call(jnp.swapaxes(x, 1, 2), stacked, depth, heads,
                              interpret=True, channels_first=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_channels_first_gradients(self, monkeypatch):
        """Full custom-VJP path with channels_first: grads wrt the (G, C, N)
        input are the transposed standard grads; weight/pos grads match."""
        monkeypatch.setenv("RELPOSE_PALLAS_INTERPRET", "1")
        from rel_pose_tpu.ops.pallas_vit import fused_vit_stack
        dim, heads, depth = 96, 3, 2
        blocks = make_blocks(depth, dim, heads)
        x = jnp.asarray(
            RNG.standard_normal((2, 64, dim)).astype(np.float32) * 0.5)
        pos = jnp.asarray(
            RNG.standard_normal((1, 64, dim)).astype(np.float32) * 0.1)
        g = jnp.asarray(RNG.standard_normal((2, 64, dim)).astype(np.float32))

        def loss_nc(xx, bb, pp):
            return jnp.sum(fused_vit_stack(xx, bb, heads, pos=pp) * g)

        def loss_cf(xx, bb, pp):
            return jnp.sum(fused_vit_stack(
                jnp.swapaxes(xx, 1, 2), bb, heads, pos=pp,
                channels_first=True) * g)

        ref = jax.grad(loss_nc, argnums=(0, 1, 2))(x, blocks, pos)
        out = jax.grad(loss_cf, argnums=(0, 1, 2))(x, blocks, pos)
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_custom_vjp_backward(self):
        from rel_pose_tpu.ops.pallas_vit import _vit_stack_bwd
        dim, heads, depth = 96, 3, 2
        blocks = make_blocks(depth, dim, heads)
        x = jnp.asarray(
            RNG.standard_normal((2, 64, dim)).astype(np.float32) * 0.5)
        stacked = stack_block_params(blocks)
        g = jnp.asarray(RNG.standard_normal((2, 64, dim)).astype(np.float32))

        from rel_pose_tpu.ops.pallas_vit import _vit_stack_call
        _, xs = _vit_stack_call(x, stacked, depth, heads, interpret=True,
                                stash=True)
        dx, dstacked, dpos = _vit_stack_bwd(
            depth, heads, False, (xs, stacked, jnp.zeros((1, 64, dim))), g)
        np.testing.assert_allclose(np.asarray(dpos[0]),
                                   np.asarray(dx).sum(0), atol=1e-5)
        # reference grads via direct autodiff
        def loss(xx, ss):
            return jnp.sum(vit_stack_reference(xx, ss, depth, heads) * g)
        dx_r, ds_r = jax.grad(loss, argnums=(0, 1))(x, stacked)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                                   atol=1e-5)
        for k in dstacked:
            np.testing.assert_allclose(np.asarray(dstacked[k]),
                                       np.asarray(ds_r[k]), atol=1e-5,
                                       err_msg=k)
