"""Equivalence tests for the hand-written ViT-stack backward kernel."""

import numpy as np
import jax
import jax.numpy as jnp

from rel_pose_tpu.nn.transformer import vit_block_init
from rel_pose_tpu.ops.pallas_vit import stack_block_params, _vit_stack_call
from rel_pose_tpu.ops.pallas_vit_bwd import vit_stack_bwd_call

RNG = np.random.default_rng(77)


def stash_forward(x, stacked, depth, heads):
    """(o, xs) from the forward kernel's training mode (interpret)."""
    return _vit_stack_call(x, stacked, depth, heads, interpret=True,
                           stash=True)


def gelu_policy_reference(x, stacked, depth, num_heads):
    """Unfused reference following the kernel's GELU policy (exact erf for
    fp32 inputs, tanh for bf16)."""
    def ln(x, scale, bias, eps=1e-6):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias)

    G, N, C = x.shape
    d = C // num_heads
    scale = d ** -0.5
    for i in range(depth):
        y = ln(x, stacked["ln1_scale"][i], stacked["ln1_bias"][i])
        qkv = y @ stacked["qkv_w"][i] + stacked["qkv_b"][i]
        heads = []
        for h in range(num_heads):
            q = qkv[:, :, h * d:(h + 1) * d]
            k = qkv[:, :, C + h * d:C + (h + 1) * d]
            v = qkv[:, :, 2 * C + h * d:2 * C + (h + 1) * d]
            s = jnp.einsum("gnd,gmd->gnm", q, k) * scale
            p = jax.nn.softmax(s, axis=-1)
            heads.append(jnp.einsum("gnm,gmd->gnd", p, v))
        attn = jnp.concatenate(heads, axis=-1)
        x = x + (attn @ stacked["proj_w"][i] + stacked["proj_b"][i])
        y = ln(x, stacked["ln2_scale"][i], stacked["ln2_bias"][i])
        h1 = y @ stacked["fc1_w"][i] + stacked["fc1_b"][i]
        hg = jax.nn.gelu(h1, approximate=(x.dtype == jnp.bfloat16))
        x = x + (hg @ stacked["fc2_w"][i] + stacked["fc2_b"][i])
    return x


class TestVitStackBackwardKernel:
    def _setup(self, depth=2, dim=96, heads=3, G=3, N=64):
        key = jax.random.PRNGKey(0)
        blocks = [vit_block_init(k, dim, heads)
                  for k in jax.random.split(key, depth)]
        stacked = stack_block_params(blocks)
        x = jnp.asarray(RNG.standard_normal((G, N, dim)).astype(np.float32)
                        * 0.5)
        g = jnp.asarray(RNG.standard_normal((G, N, dim)).astype(np.float32))
        return x, g, stacked, depth, heads

    def test_stash_forward_matches_reference_prefixes(self):
        """The training-mode forward must emit o + every block's input."""
        x, g, stacked, depth, heads = self._setup()
        o, xs = stash_forward(x, stacked, depth, heads)
        assert xs.shape == (depth,) + x.shape
        np.testing.assert_allclose(np.asarray(xs[0]), np.asarray(x),
                                   atol=1e-6)
        ref = x
        for i in range(depth):
            np.testing.assert_allclose(
                np.asarray(xs[i]), np.asarray(ref), atol=2e-5,
                err_msg=f"block {i} input")
            sliced = {k: v[i:i + 1] for k, v in stacked.items()}
            ref = gelu_policy_reference(ref, sliced, 1, heads)
        np.testing.assert_allclose(
            np.asarray(o),
            np.asarray(gelu_policy_reference(x, stacked, depth, heads)),
            atol=5e-5)

    def test_matches_autodiff(self):
        x, g, stacked, depth, heads = self._setup()
        _, xs = stash_forward(x, stacked, depth, heads)
        dx, dstacked = vit_stack_bwd_call(xs, g, stacked, depth, heads,
                                          interpret=True)

        def loss(xx, ss):
            return jnp.sum(gelu_policy_reference(xx, ss, depth, heads) * g)

        dx_r, ds_r = jax.grad(loss, argnums=(0, 1))(x, stacked)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                                   atol=5e-4)
        for k in dstacked:
            np.testing.assert_allclose(
                np.asarray(dstacked[k]), np.asarray(ds_r[k]),
                atol=5e-4, rtol=1e-3, err_msg=k)

    def test_matches_autodiff_bfloat16(self):
        """bf16 engages the speed-mode kernel branches (single-pass LN
        variance, softmax row-sum riding the AV matmul's lane padding);
        gradients must still track autodiff through the mixed-precision
        reference to bf16-level accuracy."""
        x, g, stacked, depth, heads = self._setup()
        xb = x.astype(jnp.bfloat16)
        sb = {k: v.astype(jnp.bfloat16) for k, v in stacked.items()}
        _, xs = stash_forward(xb, sb, depth, heads)
        dx, dstacked = vit_stack_bwd_call(xs, g, sb, depth, heads,
                                          interpret=True)

        def loss(xx, ss):
            out = gelu_policy_reference(xx, ss, depth, heads)
            return jnp.sum(out.astype(jnp.float32) * g)

        dx_r, ds_r = jax.grad(loss, argnums=(0, 1))(xb, sb)

        def gate(a, b, name):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            cos = a @ b / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-30)
            nrel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)
            assert cos > 0.999 and nrel < 5e-2, (name, cos, nrel)

        gate(dx, dx_r, "dx")
        for k in dstacked:
            gate(dstacked[k], ds_r[k], k)

    def test_grad_accumulation_across_instances(self):
        """Weight grads must be the SUM over all sequences: doubling the
        batch by repeating the sequence doubles dW but not dx."""
        x, g, stacked, depth, heads = self._setup(G=2)
        x2 = jnp.concatenate([x, x], axis=0)
        g2 = jnp.concatenate([g, g], axis=0)
        _, xs1 = stash_forward(x, stacked, depth, heads)
        _, xs2 = stash_forward(x2, stacked, depth, heads)
        dx1, dw1 = vit_stack_bwd_call(xs1, g, stacked, depth, heads,
                                      interpret=True)
        dx2, dw2 = vit_stack_bwd_call(xs2, g2, stacked, depth, heads,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(dx2[:2]), np.asarray(dx1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(dw2["qkv_w"]),
                                   2 * np.asarray(dw1["qkv_w"]), rtol=1e-5)

    def test_depth_one_production_width(self):
        x, g, stacked, depth, heads = self._setup(depth=1, dim=192, G=1,
                                                  N=128)
        _, xs = stash_forward(x, stacked, depth, heads)
        dx, dstacked = vit_stack_bwd_call(xs, g, stacked, depth, heads,
                                          interpret=True)

        def loss(xx, ss):
            return jnp.sum(gelu_policy_reference(xx, ss, depth, heads) * g)

        dx_r, ds_r = jax.grad(loss, argnums=(0, 1))(x, stacked)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(dstacked["fc1_w"]),
                                   np.asarray(ds_r["fc1_w"]), atol=5e-4,
                                   rtol=1e-3)
