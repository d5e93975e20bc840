"""Standard ViT self-attention block (functional JAX).

Equivalent of the reference's ``Block``/``Attention``
(``/root/reference/src/modules/vision_transformer.py:307-354``): pre-LN,
multi-head self-attention with a shared qkv projection (bias=True for the
vit-tiny config), output projection, then pre-LN MLP with GELU; residual
connections around both.  DropPath/Dropout are identity at the reference's
default rates (0.0) and are omitted from the compute path.

The attention einsum chain here is the plain-XLA path; ``ops.attention``
provides a fused Pallas kernel with identical numerics for the hot loop.
"""

import jax
import jax.numpy as jnp

from .layers import (
    linear_init, linear_apply, layernorm_init, layernorm_apply,
    mlp_init, mlp_apply,
)


def vit_block_init(key, dim, num_heads, mlp_ratio=4.0, qkv_bias=True,
                   dtype=jnp.float32):
    k_qkv, k_proj, k_mlp = jax.random.split(key, 3)
    return {
        "norm1": layernorm_init(dim, dtype),
        "qkv": linear_init(k_qkv, dim, dim * 3, bias=qkv_bias, dtype=dtype),
        "proj": linear_init(k_proj, dim, dim, dtype=dtype),
        "norm2": layernorm_init(dim, dtype),
        "mlp": mlp_init(k_mlp, dim, int(dim * mlp_ratio), dtype=dtype),
    }


def multi_head_self_attention(params, x, num_heads):
    """x: (B, N, C) -> (B, N, C).

    Attention itself runs through ``ops.pallas_attention.fused_mhsa`` — a
    single-tile Pallas kernel on TPU (no HBM materialization of the (N, N)
    scores), einsum fallback elsewhere.  Softmax statistics are fp32 either
    way.
    """
    from ..ops.pallas_attention import fused_mhsa

    B, N, C = x.shape
    head_dim = C // num_heads
    scale = head_dim ** -0.5

    qkv = linear_apply(params["qkv"], x)  # (B, N, 3C)
    qkv = qkv.reshape(B, N, 3, num_heads, head_dim)
    q = jnp.transpose(qkv[:, :, 0], (0, 2, 1, 3))  # (B, h, N, d)
    k = jnp.transpose(qkv[:, :, 1], (0, 2, 1, 3))
    v = jnp.transpose(qkv[:, :, 2], (0, 2, 1, 3))

    g = (B * num_heads, N, head_dim)
    y = fused_mhsa(q.reshape(g), k.reshape(g), v.reshape(g), scale)
    y = y.reshape(B, num_heads, N, head_dim)
    y = jnp.transpose(y, (0, 2, 1, 3)).reshape(B, N, C)
    return linear_apply(params["proj"], y)


def vit_block_apply(params, x, num_heads):
    """Pre-LN transformer block: x + MHSA(LN(x)); x + MLP(LN(x))."""
    x = x + multi_head_self_attention(
        {"qkv": params["qkv"], "proj": params["proj"]},
        layernorm_apply(params["norm1"], x), num_heads)
    x = x + mlp_apply(params["mlp"], layernorm_apply(params["norm2"], x))
    return x
