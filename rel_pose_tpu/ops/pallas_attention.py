"""Fused multi-head self-attention (Pallas TPU kernel).

Why: the plain-XLA attention materializes the (B, h, N, N) fp32 attention
matrix in HBM — at the model's shapes (N=576, h=3, eval batch 128+) that is
~1 GB of traffic per block and measured ~7 ms/block, making the five ViT
blocks the single largest cost in the forward pass.  The whole per-(batch,
head) problem (q/k/v 576x64 + a 576x576 fp32 scores tile ~1.3 MB) fits in
VMEM, so one kernel instance computes softmax(q k^T / sqrt(d)) v end to end
with zero HBM round-trips for the scores.

Design (single-tile, no online softmax needed):
  * grid = (G,) with G = batch*heads; BlockSpecs deliver one (N, d) slice of
    q/k/v per instance;
  * scores and softmax statistics in fp32 (MXU accumulates fp32 via
    preferred_element_type), weights cast back to the input dtype for the
    p@v matmul;
  * custom VJP: backward recomputes the scores in a second single-tile
    kernel (flash-style recompute — residuals are just q, k, v) and emits
    dq, dk, dv without materializing anything in HBM either.

Falls back to the einsum reference on non-TPU backends (exact same math;
equivalence is unit-tested via interpret mode).
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

def mhsa_reference(q, k, v, scale):
    """(G, N, d) einsum attention — the numerical spec for the kernel."""
    s = jnp.einsum("gnd,gmd->gnm", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("gnm,gmd->gnd", p, v)


# -------------------------------------------------------------- kernels ----

_LOG2E = 1.4426950408889634


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # fold the softmax scale into the exp2 argument: exp(x) = exp2(x*log2e)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp2(s - m)                       # unnormalized weights
    l = jnp.sum(e, axis=1, keepdims=True)
    # normalize AFTER the matmul: N x d divisions instead of N x N
    o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    # recompute softmax weights (unnormalized e + row sums l)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp2(s - m)
    l = jnp.sum(e, axis=1, keepdims=True)
    eb = e.astype(v.dtype)
    # dv = p^T do = e^T (do / l)   — fold the row normalization into do
    do_n = (do.astype(jnp.float32) / l).astype(do.dtype)
    dv_ref[0] = jax.lax.dot_general(
        eb, do_n, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dp = do v^T ; ds = p * (dp - rowsum(dp * p)),  p = e / l
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    c = jnp.sum(dp * e, axis=1, keepdims=True) / l      # rowsum(dp * p)
    ds = e * ((dp - c) * (scale / l))                   # scale folded in
    dsb = ds.astype(q.dtype)
    dq_ref[0] = jnp.dot(dsb, k, preferred_element_type=jnp.float32).astype(
        dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _spec(N, d):
    return pl.BlockSpec((1, N, d), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(q, k, v, scale, interpret=False):
    interpret = _interp(interpret)
    G, N, d = q.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((G, N, d), q.dtype),
        grid=(G,),
        in_specs=[_spec(N, d)] * 3,
        out_specs=_spec(N, d),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * N * N * d, transcendentals=G * N * N,
            bytes_accessed=4 * G * N * d * q.dtype.itemsize),
    )(q, k, v)


def _bwd_call(q, k, v, do, scale, interpret=False):
    interpret = _interp(interpret)
    G, N, d = q.shape
    shapes = [jax.ShapeDtypeStruct((G, N, d), q.dtype)] * 3
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=shapes,
        grid=(G,),
        in_specs=[_spec(N, d)] * 4,
        out_specs=[_spec(N, d)] * 3,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * G * N * N * d, transcendentals=G * N * N,
            bytes_accessed=7 * G * N * d * q.dtype.itemsize),
    )(q, k, v, do)


# ------------------------------------------------------------ public op ----

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mhsa_pallas(q, k, v, scale):
    return _fwd_call(q, k, v, scale)


def _mhsa_fwd(q, k, v, scale):
    return _fwd_call(q, k, v, scale), (q, k, v)


def _mhsa_bwd(scale, res, do):
    q, k, v = res
    dq, dk, dv = _bwd_call(q, k, v, do, scale)
    return dq, dk, dv


_mhsa_pallas.defvjp(_mhsa_fwd, _mhsa_bwd)


def fused_mhsa(q, k, v, scale):
    """softmax(q k^T * scale) v over (G, N, d) batched heads.

    Uses the Pallas kernel on TPU, einsum elsewhere (identical numerics up
    to fp rounding).
    """
    if _use_pallas():
        return _maybe_shard_map(
            lambda a, b, c: _mhsa_pallas(a, b, c, scale),
            (q, k, v), (True, True, True))
    return mhsa_reference(q, k, v, scale)
