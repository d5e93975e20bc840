"""Essential Matrix Module compute ops — the paper's core contribution.

Re-implements the reference's ``CrossAttention``
(``/root/reference/src/modules/vision_transformer.py:160-262``) as pure
functions over a params pytree:

  1. shared qkv projection applied to both images' tokens;
  2. cross-attention logits attn_1 = (q2 k1^T) / sqrt(d),
     attn_2 = (q1 k2^T) / sqrt(d);
  3. DUAL softmax: softmax(dim=-1) * softmax(dim=-2) elementwise
     (``:205-206``; ``use_single_softmax`` falls back to row softmax);
  4. per-head positional 6-vector appended to v: (B, h, N, d+6);
  5. bilinear "fundamental" contraction F = v^T A v — per head a
     (d+6)x(d+6) moment matrix analogous to U^T U in the 8-point algorithm;
  6. head-concat reshape + linear projection to dim.

The compute itself is dispatched to the fused kernels:
``ops.pallas_essential_block`` (the whole 2-direction x num_heads block from
raw qkv tensors) and ``ops.pallas_attention`` for the --noess path, each with
an einsum fallback off-TPU.
"""

import jax
import jax.numpy as jnp

from ..nn.layers import linear_init, linear_apply


def cross_attention_init(key, dim, num_heads, qkv_bias=True, noess=False,
                         no_pos_encoding=False, dtype=jnp.float32):
    """Params for the cross block's attention
    (``vision_transformer.py:165-186``)."""
    k_qkv, k_proj = jax.random.split(key)
    params = {"qkv": linear_init(k_qkv, dim, dim * 3, bias=qkv_bias,
                                 dtype=dtype)}
    if noess:
        params["proj"] = linear_init(k_proj, dim, dim, dtype=dtype)
    else:
        pos = 0 if no_pos_encoding else 6 * num_heads
        params["proj_fundamental"] = linear_init(k_proj, dim + pos, dim,
                                                 dtype=dtype)
    return params


def _split_heads(qkv, num_heads):
    """(B, N, 3C) -> three (B, h, N, d)."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    qkv = qkv.reshape(B, N, 3, num_heads, C // num_heads)
    qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
    return qkv[0], qkv[1], qkv[2]


def dual_softmax(attn):
    """softmax over the last axis times softmax over the second-to-last axis,
    elementwise (``vision_transformer.py:205-206``).  fp32 internally."""
    a = attn.astype(jnp.float32)
    return (jax.nn.softmax(a, axis=-1) * jax.nn.softmax(a, axis=-2))


def essential_cross_attention(params, x1, x2, positional, num_heads,
                              cross_features=False, use_single_softmax=False):
    """The essential-matrix path of ``CrossAttention.forward``
    (``vision_transformer.py:188-238``).

    Args:
      x1, x2: ``(B, N, C)`` pre-normed token sets of the two images.
      positional: ``(B, N, 6)`` table from ``ops.posenc`` or None
        (= --no_pos_encoding).
    Returns:
      (out1, out2): each ``(B, d+p, C)`` token block where p = 6 if
      positional encodings are used else 0.  NOTE the ViLBERT-style swap is
      already applied (out1 is derived from attn_2's stream), matching the
      reference's flipped return (``:236-238``).
    """
    B, N, C = x1.shape

    # Both directions x all heads computed by ONE fused kernel straight from
    # the token sets — the qkv projection AND head slicing happen in VMEM,
    # so the (B, N, 3C) qkv tensors and their HBM relayouts (head
    # transposes + direction concats) disappear entirely.
    from .pallas_essential_block import fused_essential_block_x

    f = fused_essential_block_x(x1, x2, params["qkv"], positional, num_heads,
                                cross_features=cross_features,
                                use_single_softmax=use_single_softmax)
    f = f.astype(x1.dtype)                   # (B, 2, h, e, e)
    e = f.shape[-1]
    fund_1, fund_2 = f[:, 0], f[:, 1]
    fund_1 = jnp.swapaxes(fund_1.reshape(B, num_heads * e, e), -2, -1)
    fund_2 = jnp.swapaxes(fund_2.reshape(B, num_heads * e, e), -2, -1)

    fund_2 = linear_apply(params["proj_fundamental"], fund_2)
    fund_1 = linear_apply(params["proj_fundamental"], fund_1)

    # ViLBERT-style flip (:236-238)
    return fund_2, fund_1


def essential_cross_attention_pair(params, ln_params, xp, positional,
                                   num_heads, cross_features=False,
                                   use_single_softmax=False):
    """LN-fused variant of :func:`essential_cross_attention`: takes the RAW
    interleaved pair tokens ``xp (B, 2, N, C)`` plus the cross block's norm1
    params, so on TPU the LayerNorm, pair split, and qkv projection all stay
    in VMEM (see ``fused_essential_block_pair``).  Returns the same
    ViLBERT-flipped (out1, out2)."""
    B, _, N, C = xp.shape
    from .pallas_essential_block import fused_essential_block_pair

    f = fused_essential_block_pair(xp, ln_params, params["qkv"], positional,
                                   num_heads, cross_features=cross_features,
                                   use_single_softmax=use_single_softmax)
    f = f.astype(xp.dtype)                   # (B, 2, h, e, e)
    e = f.shape[-1]
    fund_1, fund_2 = f[:, 0], f[:, 1]
    fund_1 = jnp.swapaxes(fund_1.reshape(B, num_heads * e, e), -2, -1)
    fund_2 = jnp.swapaxes(fund_2.reshape(B, num_heads * e, e), -2, -1)

    fund_2 = linear_apply(params["proj_fundamental"], fund_2)
    fund_1 = linear_apply(params["proj_fundamental"], fund_1)

    # ViLBERT-style flip (:236-238)
    return fund_2, fund_1


def noess_cross_attention(params, x1, x2, num_heads):
    """The --noess ablation path (``vision_transformer.py:239-262``):
    plain softmax cross-attention exchanging features, keeping (B, N, C).
    Returns (out1, out2) with the ViLBERT flip applied."""
    B, N, C = x1.shape
    d = C // num_heads
    scale = d ** -0.5

    from .pallas_attention import fused_mhsa

    q1, k1, v1 = _split_heads(linear_apply(params["qkv"], x1), num_heads)
    q2, k2, v2 = _split_heads(linear_apply(params["qkv"], x2), num_heads)

    # one fused launch for both directions: y1 = attn(q2, k1) v1,
    # y2 = attn(q1, k2) v2
    g = (2 * B * num_heads, N, d)
    q_all = jnp.concatenate([q2, q1], axis=0).reshape(g)
    k_all = jnp.concatenate([k1, k2], axis=0).reshape(g)
    v_all = jnp.concatenate([v1, v2], axis=0).reshape(g)
    y = fused_mhsa(q_all, k_all, v_all, scale)
    y = y.reshape(2, B, num_heads, N, d)
    y = jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(2, B, N, C)
    y1, y2 = y[0], y[1]

    y1 = linear_apply(params["proj"], y1)
    y2 = linear_apply(params["proj"], y2)
    return y2, y1
