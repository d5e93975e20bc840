"""Pallas backward for the ViT-stack megakernel.

The forward megakernel (``pallas_vit``) leaves training backward on the
unfused path, which pays an HBM round-trip per op during recompute.  This
kernel computes the FULL VJP of all blocks in one pass per sequence:

  * residuals are the per-block INPUT activations ``xs`` stashed by the
    training-mode forward kernel (one extra HBM write of depth x tokens,
    ~0.2 ms at batch 60 — vs a full in-kernel forward recompute, which
    was ~26% of this kernel's FLOPs); each block's remaining forward
    intermediates are rebuilt in VMEM flash-style from its stashed input;
  * dx flows backwards through LN / matmul / softmax / tanh-GELU chains
    entirely in VMEM;
  * WEIGHT gradients are accumulated ACROSS grid instances into revolving
    fp32 output blocks (constant index_map + sequential grid: the block
    stays resident in VMEM; instance 0 zero-initializes, every instance
    adds its contribution).  This requires dimension_semantics=("arbitrary",)
    — the grid must execute sequentially.

All math matches jax.vjp of ``vit_stack_reference`` with tanh GELU
(equivalence unit-tested in interpret mode).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import interpret_default as _interp

from .pallas_vit import _STACK_FIELDS
from .kernel_gelu import kernel_gelu, kernel_gelu_grad

_LOG2E = 1.4426950408889634
_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)
_GELU_C = 0.044715


def _ln_fwd(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    if x.dtype == jnp.bfloat16:
        # single-traversal variance (see ops/pallas_vit._ln): E[x^2] and
        # E[x] accumulate in one pass; cancellation error is below bf16
        # resolution.  fp32 keeps the centered two-pass form.
        # clamped: cancellation can drive the difference slightly negative
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            - jnp.square(mean), 0.0)
    else:
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xc = xf - mean
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    y = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y, xhat, inv


def _ln_bwd(dy, xhat, inv, scale):
    """Returns (dx, dscale, dbias) for y = xhat*scale + bias."""
    dy = dy.astype(jnp.float32)
    dscale = jnp.sum(dy * xhat, axis=0)
    dbias = jnp.sum(dy, axis=0)
    dxhat = dy * scale.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = inv * (dxhat - m1 - xhat * m2)
    return dx, dscale, dbias


def _attn_fwd_heads(qkv, C, num_heads, head_dim, scale, cdt):
    """All-head attention recompute in three phases (all QK matmuls, then
    all softmaxes, then all AV matmuls) so Mosaic can overlap head h+1's
    MXU matmul with head h's VPU softmax — a per-head chain serializes
    them.  Returns (heads o-list, per-head (q, k, v, e, l) stash)."""
    qs, ks, vs = [], [], []
    scs = []
    for h in range(num_heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, C + h * head_dim:C + (h + 1) * head_dim]
        v = qkv[:, 2 * C + h * head_dim:2 * C + (h + 1) * head_dim]
        qs.append(q)
        ks.append(k)
        vs.append(v)
        scs.append(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale)
    # bf16: softmax row-sum rides the AV matmul's free 64->128 lane
    # padding as a ones column on v (see ops/pallas_vit); fp32 keeps the
    # exact VPU sum.
    mxu_sum = cdt == jnp.bfloat16
    els = []
    for sc in scs:
        m = jnp.max(sc, axis=1, keepdims=True)
        e = jnp.exp2(sc - m)
        els.append((e, None) if mxu_sum else
                   (e, jnp.sum(e, axis=1, keepdims=True)))
    heads, stash = [], []
    for h, (e, l) in enumerate(els):
        v = vs[h]
        if mxu_sum:
            v = jnp.concatenate(
                [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1)
        o = jnp.dot(e.astype(cdt), v, preferred_element_type=jnp.float32)
        if mxu_sum:
            l = o[:, head_dim:head_dim + 1]
            o = o[:, :head_dim]
        heads.append(o * (1.0 / l))
        stash.append((qs[h], ks[h], vs[h], e, l))
    return heads, stash


def _attn_bwd_heads(dattn, stash, num_heads, head_dim, scale, cdt):
    """All-head VJP of o = (e @ v)/l, phase-batched like the forward:
    all dv/dp matmuls, then all VPU softmax-backward chains, then all
    dq/dk matmuls.  Returns per-head (dq, dk, dv) lists."""
    dvs, dps = [], []
    for h in range(num_heads):
        _, _, v, e, l = stash[h]
        do = dattn[:, h * head_dim:(h + 1) * head_dim]
        do_n = (do / l).astype(cdt)
        dvs.append(jax.lax.dot_general(
            e.astype(cdt), do_n, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dps.append(jax.lax.dot_general(
            do.astype(cdt), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    dsbs = []
    for h in range(num_heads):
        _, _, _, e, l = stash[h]
        dp = dps[h]
        c = jnp.sum(dp * e, axis=1, keepdims=True) / l
        # d s2 where s2 = s*scale*log2e - m; exp2' = ln2 * exp2
        ds2 = e * ((dp - c) / l) * math.log(2.0)
        dsbs.append((ds2 * (scale * _LOG2E)).astype(cdt))
    dqs, dks = [], []
    for h in range(num_heads):
        q, k, _, _, _ = stash[h]
        dqs.append(jnp.dot(dsbs[h], k, preferred_element_type=jnp.float32))
        dks.append(jax.lax.dot_general(
            dsbs[h], q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    return dqs, dks, dvs


def _vit_stack_bwd_kernel(xs_ref, g_ref,
                          ln1s_ref, ln1b_ref, qkvw_ref, qkvb_ref,
                          projw_ref, projb_ref, ln2s_ref, ln2b_ref,
                          fc1w_ref, fc1b_ref, fc2w_ref, fc2b_ref,
                          dx_ref,
                          dln1s_ref, dln1b_ref, dqkvw_ref, dqkvb_ref,
                          dprojw_ref, dprojb_ref, dln2s_ref, dln2b_ref,
                          dfc1w_ref, dfc1b_ref, dfc2w_ref, dfc2b_ref,
                          *, depth, num_heads, head_dim):
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        for ref in (dln1s_ref, dln1b_ref, dqkvw_ref, dqkvb_ref, dprojw_ref,
                    dprojb_ref, dln2s_ref, dln2b_ref, dfc1w_ref, dfc1b_ref,
                    dfc2w_ref, dfc2b_ref):
            ref[...] = jnp.zeros_like(ref)

    N, C = xs_ref.shape[-2], xs_ref.shape[-1]
    cdt = xs_ref.dtype
    scale = head_dim ** -0.5

    # ---- backward (block inputs come stashed from the forward kernel)
    dxo = g_ref[0].astype(jnp.float32)
    for i in reversed(range(depth)):
        x_in = xs_ref[i, 0]
        # recompute block-i forward pieces needed for the VJP
        y1, xhat1, inv1 = _ln_fwd(x_in, ln1s_ref[i], ln1b_ref[i])
        y1 = y1.astype(cdt)
        qkv = (jnp.dot(y1, qkvw_ref[i], preferred_element_type=jnp.float32)
               + qkvb_ref[i].astype(jnp.float32)).astype(cdt)
        heads, stash = _attn_fwd_heads(qkv, C, num_heads, head_dim,
                                       scale * _LOG2E, cdt)
        attn = jnp.concatenate(heads, axis=-1).astype(cdt)
        proj = (jnp.dot(attn, projw_ref[i],
                        preferred_element_type=jnp.float32)
                + projb_ref[i].astype(jnp.float32))
        xa = (x_in.astype(jnp.float32) + proj).astype(cdt)
        y2, xhat2, inv2 = _ln_fwd(xa, ln2s_ref[i], ln2b_ref[i])
        y2 = y2.astype(cdt)
        h1 = (jnp.dot(y2, fc1w_ref[i], preferred_element_type=jnp.float32)
              + fc1b_ref[i].astype(jnp.float32))
        hg = kernel_gelu(h1, tanh_form=(cdt == jnp.bfloat16)).astype(cdt)

        # mlp branch backward: x_out = xa + (gelu(y2 W1 + b1) W2 + b2)
        dout = dxo                                  # (N, C) fp32
        dout_b = dout.astype(cdt)
        dfc2w_ref[i] += jax.lax.dot_general(
            hg, dout_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dfc2b_ref[i] += jnp.sum(dout, axis=0)
        dhg = jnp.dot(dout_b, fc2w_ref[i].T,
                      preferred_element_type=jnp.float32)
        dh1 = dhg * kernel_gelu_grad(h1, tanh_form=(cdt == jnp.bfloat16))
        dh1_b = dh1.astype(cdt)
        dfc1w_ref[i] += jax.lax.dot_general(
            y2, dh1_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dfc1b_ref[i] += jnp.sum(dh1, axis=0)
        dy2 = jnp.dot(dh1_b, fc1w_ref[i].T,
                      preferred_element_type=jnp.float32)
        dxa_ln, dsc2, dbi2 = _ln_bwd(dy2, xhat2, inv2, ln2s_ref[i])
        dln2s_ref[i] += dsc2
        dln2b_ref[i] += dbi2
        dxa = dxo + dxa_ln

        # attention branch backward: xa = x_in + (attn @ Wp + bp)
        dproj = dxa
        dproj_b = dproj.astype(cdt)
        dprojw_ref[i] += jax.lax.dot_general(
            attn, dproj_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dprojb_ref[i] += jnp.sum(dproj, axis=0)
        dattn = jnp.dot(dproj_b, projw_ref[i].T,
                        preferred_element_type=jnp.float32)
        dqs, dks, dvs = _attn_bwd_heads(dattn, stash, num_heads,
                                        head_dim, scale, cdt)
        dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (N, 3C)
        dqkv_b = dqkv.astype(cdt)
        dqkvw_ref[i] += jax.lax.dot_general(
            y1, dqkv_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dqkvb_ref[i] += jnp.sum(dqkv, axis=0)
        dy1 = jnp.dot(dqkv_b, qkvw_ref[i].T,
                      preferred_element_type=jnp.float32)
        dx_ln, dsc1, dbi1 = _ln_bwd(dy1, xhat1, inv1, ln1s_ref[i])
        dln1s_ref[i] += dsc1
        dln1b_ref[i] += dbi1
        dxo = dxa + dx_ln

    dx_ref[0] = dxo.astype(dx_ref.dtype)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda g: (0,) * nd, memory_space=pltpu.VMEM)


def vit_stack_bwd_call(xs, g, stacked, depth, num_heads, interpret=False):
    interpret = _interp(interpret)
    """Returns (dx, dstacked-dict) — grads wrt the stack input and every
    stacked weight.  ``xs`` is the (depth, G, N, C) per-block input stash
    produced by the forward kernel's training mode (``xs[0]`` is the stack
    input x)."""
    _, G, N, C = xs.shape
    head_dim = C // num_heads
    seq_spec = pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    xs_spec = pl.BlockSpec((depth, 1, N, C), lambda i: (0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [xs_spec, seq_spec]
    args = [xs, g]
    names = [n for n, _ in _STACK_FIELDS]
    for n in names:
        in_specs.append(_const_spec(stacked[n].shape))
        args.append(stacked[n])

    out_shapes = [jax.ShapeDtypeStruct((G, N, C), xs.dtype)]
    out_specs = [seq_spec]
    for n in names:
        out_shapes.append(
            jax.ShapeDtypeStruct(stacked[n].shape, jnp.float32))
        out_specs.append(_const_spec(stacked[n].shape))

    res = pl.pallas_call(
        functools.partial(_vit_stack_bwd_kernel, depth=depth,
                          num_heads=num_heads, head_dim=head_dim),
        out_shape=out_shapes,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: accumulation
            # weights (4.4MB bf16) + fp32 grad accumulators (~9.5MB) + block
            # intermediates exceed the 16MB default scoped-vmem limit; v5e
            # has 128MB physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * depth * N * (4 * C * C + 2 * N * head_dim
                                       * num_heads + 8 * C * C),
            transcendentals=G * depth * N * (N + 4 * C),
            bytes_accessed=(depth + 2) * G * N * C * xs.dtype.itemsize),
    )(*args)
    dx = res[0]
    dstacked = {n: r for n, r in zip(names, res[1:])}
    return dx, dstacked
