"""Pallas backward for the fused essential-matrix block.

Completes the training path: the block forward kernel consumes raw qkv
tensors; its previous backward composed per-head Pallas VJPs, which pays
HBM relayouts for the head split / direction concat on both sides of the
VJP.  This kernel computes dqkv1/dqkv2/dpos per batch element entirely in
VMEM (one grid instance = all 2 directions x num_heads combos):

  recompute s, row/col softmax pieces; then per combo
    dva = A vb dF^T ; dvb = A^T va dF ; dA = va dF vb^T
    ds  = R (dR - rowsum(dR R)) + C (dC - colsum(dC C))
    dq  = ds k * scale ; dk = ds^T q * scale
  scattering results into static column slices of the qkv cotangents and
  accumulating the positional-columns of dva/dvb into dpos.

No cross-instance accumulation needed (all outputs are per-batch-element).
Equivalence vs autodiff of the einsum reference is unit-tested in interpret
mode.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .runtime import interpret_default as _interp

_LOG2E = 1.4426950408889634
_LN2 = math.log(2.0)


def _essential_block_bwd_kernel(qkv1_ref, qkv2_ref, pos_ref, df_ref,
                                dqkv1_ref, dqkv2_ref, dpos_ref, *,
                                num_heads, head_dim, has_pos, cross_features,
                                use_single_softmax):
    qkv1 = qkv1_ref[0]
    qkv2 = qkv2_ref[0]
    N = qkv1.shape[0]
    C = num_heads * head_dim
    cdt = qkv1.dtype
    scale = head_dim ** -0.5
    pos = pos_ref[0].astype(cdt) if has_pos else None

    # accumulate straight into the output refs (static-slice stores;
    # functional .at[].add lowers to scatter-add, which Mosaic lacks)
    dqkv1_ref[0] = jnp.zeros((N, 3 * C), dqkv1_ref.dtype)
    dqkv2_ref[0] = jnp.zeros((N, 3 * C), dqkv2_ref.dtype)
    dpos_ref[0] = jnp.zeros((N, 6), dpos_ref.dtype)

    for direction in range(2):
        q_src, k_src = (qkv2, qkv1) if direction == 0 else (qkv1, qkv2)
        for h in range(num_heads):
            lo = h * head_dim
            q = q_src[:, lo:lo + head_dim]
            k = k_src[:, C + lo:C + lo + head_dim]
            v_self = k_src[:, 2 * C + lo:2 * C + lo + head_dim]
            v_other = q_src[:, 2 * C + lo:2 * C + lo + head_dim]
            if has_pos:
                v_self = jnp.concatenate([v_self, pos], axis=-1)
                v_other = jnp.concatenate([v_other, pos], axis=-1)
            va = v_other if cross_features else v_self
            vb = v_self
            df = df_ref[0, direction, h].astype(jnp.float32)

            # recompute softmax pieces (normalized, fp32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (scale * _LOG2E)
            mr = jnp.max(s, axis=1, keepdims=True)
            er = jnp.exp2(s - mr)
            R = er / jnp.sum(er, axis=1, keepdims=True)
            if use_single_softmax:
                A = R
                Cmat = None
            else:
                mc = jnp.max(s, axis=0, keepdims=True)
                ec = jnp.exp2(s - mc)
                Cmat = ec / jnp.sum(ec, axis=0, keepdims=True)
                A = R * Cmat
            Ab = A.astype(cdt)

            # dva = A vb dF^T ; dvb = A^T va dF ; dA = (va dF) vb^T
            dfb = df.astype(cdt)
            vbdft = jnp.dot(vb, dfb.T, preferred_element_type=jnp.float32)
            dva = jnp.dot(Ab, vbdft.astype(cdt),
                          preferred_element_type=jnp.float32)
            vadf = jnp.dot(va, dfb, preferred_element_type=jnp.float32)
            vadf_b = vadf.astype(cdt)
            dvb = jax.lax.dot_general(
                Ab, vadf_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dA = jax.lax.dot_general(
                vadf_b, vb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            if use_single_softmax:
                ds = R * (dA - jnp.sum(dA * R, axis=1, keepdims=True))
            else:
                dR = dA * Cmat
                dC = dA * R
                ds = (R * (dR - jnp.sum(dR * R, axis=1, keepdims=True))
                      + Cmat * (dC - jnp.sum(dC * Cmat, axis=0,
                                             keepdims=True)))
            dsb = (ds * scale).astype(cdt)
            dq = jnp.dot(dsb, k, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                dsb, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            # scatter into the right qkv cotangents (each q/k slot is
            # written by exactly ONE (direction, head) combo -> plain store)
            if direction == 0:   # q from qkv2, k/v_self from qkv1
                dqkv2_ref[0, :, lo:lo + head_dim] = dq.astype(dqkv2_ref.dtype)
                dqkv1_ref[0, :, C + lo:C + lo + head_dim] = dk.astype(
                    dqkv1_ref.dtype)
                self_ref, other_ref = dqkv1_ref, dqkv2_ref
            else:                # q from qkv1, k/v_self from qkv2
                dqkv1_ref[0, :, lo:lo + head_dim] = dq.astype(dqkv1_ref.dtype)
                dqkv2_ref[0, :, C + lo:C + lo + head_dim] = dk.astype(
                    dqkv2_ref.dtype)
                self_ref, other_ref = dqkv2_ref, dqkv1_ref

            # value grads: vb == v_self always; va is v_other under
            # cross_features else v_self.  v slots accumulate (each image's
            # v is used in both directions only via va when cross).
            dv_self = dvb + (0.0 if cross_features else dva)
            if has_pos:
                dpos_ref[0] += dv_self[:, head_dim:].astype(dpos_ref.dtype)
                dv_self_head = dv_self[:, :head_dim]
            else:
                dv_self_head = dv_self
            self_ref[0, :, 2 * C + lo:2 * C + lo + head_dim] += \
                dv_self_head.astype(self_ref.dtype)
            if cross_features:
                if has_pos:
                    dpos_ref[0] += dva[:, head_dim:].astype(dpos_ref.dtype)
                    dva_head = dva[:, :head_dim]
                else:
                    dva_head = dva
                other_ref[0, :, 2 * C + lo:2 * C + lo + head_dim] += \
                    dva_head.astype(other_ref.dtype)


def essential_block_bwd_call(qkv1, qkv2, positional, df, num_heads,
                             cross_features, use_single_softmax, has_pos,
                             interpret=False):
    interpret = _interp(interpret)
    """Returns (dqkv1, dqkv2, dpositional)."""
    B, N, C3 = qkv1.shape
    C = C3 // 3
    head_dim = C // num_heads
    e = head_dim + (6 if has_pos else 0)
    qspec = pl.BlockSpec((1, N, C3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, N, 6), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, 2, num_heads, e, e),
                         lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((B, N, C3), qkv1.dtype),
        jax.ShapeDtypeStruct((B, N, C3), qkv2.dtype),
        jax.ShapeDtypeStruct((B, N, 6), positional.dtype),
    ]
    return pl.pallas_call(
        functools.partial(
            _essential_block_bwd_kernel, num_heads=num_heads,
            head_dim=head_dim, has_pos=has_pos,
            cross_features=cross_features,
            use_single_softmax=use_single_softmax),
        out_shape=out_shapes,
        grid=(B,),
        in_specs=[qspec, qspec, pspec, fspec],
        out_specs=[qspec, qspec, pspec],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * 2 * num_heads * N * N * (head_dim + 2 * e),
            transcendentals=B * 4 * num_heads * N * N,
            bytes_accessed=4 * B * N * C3 * qkv1.dtype.itemsize),
    )(qkv1, qkv2, positional, df)
