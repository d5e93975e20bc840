"""Fused Essential-Matrix bilinear attention (Pallas TPU kernel).

The paper's core op (reference ``vision_transformer.py:198-223``):

    s = q K^T / sqrt(d)
    A = softmax_row(s) * softmax_col(s)        (dual softmax)
    F = va^T A vb                              ((d+6) x (d+6) moment matrix)

A plain-XLA implementation materializes THREE (N, N) fp32 tensors (the two
softmaxes and their product) in HBM.  Here one kernel instance handles one
(batch, head, direction) slice entirely in VMEM: N=576 scores tile is
~1.3 MB fp32, v-tiles are 576 x ~70 — everything fits with room to spare.

The backward pass is a second single-tile kernel (recompute strategy:
residuals are just the inputs) implementing the dual-softmax VJP:

    dA  = va dF vb^T
    ds  = R (dR - rowsum(dR R)) + C (dC - colsum(dC C)),
          dR = dA*C, dC = dA*R
    dq  = ds k / sqrt(d);  dk = ds^T q / sqrt(d)
    dva = A vb dF^T;       dvb = A^T va dF

Falls back to the einsum reference on non-TPU backends.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .runtime import use_pallas as _use_pallas
from .runtime import interpret_default as _interp
from .runtime import maybe_shard_map as _maybe_shard_map


# ------------------------------------------------------------ reference ----

def bilinear_attention_reference(q, k, va, vb, scale, single_softmax=False):
    """(G, N, d), (G, N, d), (G, N, e), (G, N, e) -> (G, e, e)."""
    s = jnp.einsum("gnd,gmd->gnm", q, k) * scale
    sf = s.astype(jnp.float32)
    if single_softmax:
        A = jax.nn.softmax(sf, axis=-1)
    else:
        A = jax.nn.softmax(sf, axis=-1) * jax.nn.softmax(sf, axis=-2)
    A = A.astype(q.dtype)
    return jnp.einsum("gne,gnm,gmf->gef", va, A, vb)


# -------------------------------------------------------------- kernels ----

_LOG2E = 1.4426950408889634


def _softmaxes(s2, single_softmax):
    """s2 = scores pre-multiplied by log2(e); returns (R, C, A) normalized."""
    mr = jnp.max(s2, axis=1, keepdims=True)
    er = jnp.exp2(s2 - mr)
    R = er / jnp.sum(er, axis=1, keepdims=True)
    if single_softmax:
        return R, None, R
    mc = jnp.max(s2, axis=0, keepdims=True)
    ec = jnp.exp2(s2 - mc)
    C = ec / jnp.sum(ec, axis=0, keepdims=True)
    return R, C, R * C


def _fwd_kernel(q_ref, k_ref, va_ref, vb_ref, f_ref, *, scale,
                single_softmax):
    q, k = q_ref[0], k_ref[0]
    va, vb = va_ref[0], vb_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)
    # unnormalized weights; normalizations folded into the cheap (N, e)
    # sides of the two matmuls instead of two (N, N) division passes.
    mr = jnp.max(s, axis=1, keepdims=True)
    er = jnp.exp2(s - mr)
    lr = jnp.sum(er, axis=1, keepdims=True)            # (N, 1)
    if single_softmax:
        P = er.astype(vb.dtype)
        vb_n = vb
    else:
        mc = jnp.max(s, axis=0, keepdims=True)
        ec = jnp.exp2(s - mc)
        lc = jnp.sum(ec, axis=0, keepdims=True)        # (1, N)
        P = (er * ec).astype(vb.dtype)
        vb_n = (vb.astype(jnp.float32) / lc.reshape(-1, 1)).astype(vb.dtype)
    av = jnp.dot(P, vb_n, preferred_element_type=jnp.float32)
    av = (av / lr).astype(va.dtype)
    f_ref[0] = jax.lax.dot_general(
        va, av, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(f_ref.dtype)


def _bwd_kernel(q_ref, k_ref, va_ref, vb_ref, df_ref,
                dq_ref, dk_ref, dva_ref, dvb_ref, *, scale, single_softmax):
    q, k = q_ref[0], k_ref[0]
    va, vb = va_ref[0], vb_ref[0]
    df = df_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)
    R, C, A = _softmaxes(s, single_softmax)
    Ab = A.astype(va.dtype)

    # dva = A vb dF^T ; dvb = A^T va dF
    vbdft = jnp.dot(vb, df.T.astype(vb.dtype),
                    preferred_element_type=jnp.float32).astype(vb.dtype)
    dva_ref[0] = jnp.dot(Ab, vbdft,
                         preferred_element_type=jnp.float32).astype(
        dva_ref.dtype)
    vadf = jnp.dot(va, df.astype(va.dtype),
                   preferred_element_type=jnp.float32).astype(va.dtype)
    dvb_ref[0] = jax.lax.dot_general(
        Ab, vadf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dvb_ref.dtype)

    # dA = va dF vb^T  (fp32)
    dA = jax.lax.dot_general(
        vadf, vb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    if single_softmax:
        ds = R * (dA - jnp.sum(dA * R, axis=1, keepdims=True))
    else:
        dR = dA * C
        dC = dA * R
        ds = (R * (dR - jnp.sum(dR * R, axis=1, keepdims=True))
              + C * (dC - jnp.sum(dC * C, axis=0, keepdims=True)))
    dsb = (ds * scale).astype(q.dtype)
    dq_ref[0] = jnp.dot(dsb, k, preferred_element_type=jnp.float32).astype(
        dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _spec(N, d):
    return pl.BlockSpec((1, N, d), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)


def _fspec(e):
    return pl.BlockSpec((1, e, e), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(q, k, va, vb, scale, single_softmax, interpret=False):
    interpret = _interp(interpret)
    G, N, d = q.shape
    e = va.shape[-1]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale,
                          single_softmax=single_softmax),
        out_shape=jax.ShapeDtypeStruct((G, e, e), jnp.float32),
        grid=(G,),
        in_specs=[_spec(N, d), _spec(N, d), _spec(N, e), _spec(N, e)],
        out_specs=_fspec(e),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * N * N * (d + 2 * e), transcendentals=2 * G * N * N,
            bytes_accessed=2 * G * N * (d + e) * q.dtype.itemsize),
    )(q, k, va, vb)


def _bwd_call(q, k, va, vb, df, scale, single_softmax, interpret=False):
    interpret = _interp(interpret)
    G, N, d = q.shape
    e = va.shape[-1]
    out_shapes = [
        jax.ShapeDtypeStruct((G, N, d), q.dtype),
        jax.ShapeDtypeStruct((G, N, d), k.dtype),
        jax.ShapeDtypeStruct((G, N, e), va.dtype),
        jax.ShapeDtypeStruct((G, N, e), vb.dtype),
    ]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale,
                          single_softmax=single_softmax),
        out_shape=out_shapes,
        grid=(G,),
        in_specs=[_spec(N, d), _spec(N, d), _spec(N, e), _spec(N, e),
                  _fspec(e)],
        out_specs=[_spec(N, d), _spec(N, d), _spec(N, e), _spec(N, e)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=6 * G * N * N * (d + 2 * e), transcendentals=2 * G * N * N,
            bytes_accessed=4 * G * N * (d + e) * q.dtype.itemsize),
    )(q, k, va, vb, df)


# ------------------------------------------------------------ public op ----

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _bilinear_pallas(q, k, va, vb, scale, single_softmax):
    return _fwd_call(q, k, va, vb, scale, single_softmax)


def _bilinear_fwd(q, k, va, vb, scale, single_softmax):
    return (_fwd_call(q, k, va, vb, scale, single_softmax), (q, k, va, vb))


def _bilinear_bwd(scale, single_softmax, res, df):
    q, k, va, vb = res
    return _bwd_call(q, k, va, vb, df, scale, single_softmax)


_bilinear_pallas.defvjp(_bilinear_fwd, _bilinear_bwd)


def fused_bilinear_attention(q, k, va, vb, scale, single_softmax=False):
    """F = va^T (dual_softmax(q k^T * scale)) vb over (G, N, *) slices.

    Returns (G, e, e) float32.  Pallas on TPU, einsum elsewhere.
    """
    if _use_pallas():
        return _maybe_shard_map(
            lambda a, b, c, d: _bilinear_pallas(a, b, c, d, scale,
                                                single_softmax),
            (q, k, va, vb), (True, True, True, True))
    return bilinear_attention_reference(
        q, k, va, vb, scale, single_softmax).astype(jnp.float32)
