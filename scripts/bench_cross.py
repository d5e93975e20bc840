#!/usr/bin/env python
"""Microbench of the fused essential-block kernel variants on the real TPU.

Quantifies where the ~6.4 ms cross stage goes (VPU dual softmax vs MXU
matmuls vs scheduling) by timing the production kernel against ablated /
restructured variants.  Profiling tool only — variants are NOT parity
checked here beyond a coarse sum.
"""

import functools
import os
import time

import numpy as np

from rel_pose_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rel_pose_tpu.ops.pallas_essential_block import (
    _essential_block_call, _essential_block_kernel)

B = int(os.environ.get("BENCH_BATCH", "256"))
ITERS = int(os.environ.get("BENCH_ITERS", "30"))
N, C = 576, 192
H = 3
_LOG2E = 1.4426950408889634


def _variant_kernel(qkv1_ref, qkv2_ref, pos_ref, f_ref, *, num_heads,
                    head_dim, mode):
    """mode: 'mxu_sums' = row/col sums via ones-matmuls (frees VPU);
    'bf16_mul' = P product in bf16."""
    qkv1 = qkv1_ref[0]
    qkv2 = qkv2_ref[0]
    Cl = num_heads * head_dim
    scale = (head_dim ** -0.5) * _LOG2E
    pos = pos_ref[0].astype(qkv1.dtype)
    nn = qkv1.shape[0]
    ones = jnp.ones((nn, 8), jnp.bfloat16)

    for direction in range(2):
        q_src, k_src = (qkv2, qkv1) if direction == 0 else (qkv1, qkv2)
        for h in range(num_heads):
            lo = h * head_dim
            q = q_src[:, lo:lo + head_dim]
            k = k_src[:, Cl + lo:Cl + lo + head_dim]
            v_self = k_src[:, 2 * Cl + lo:2 * Cl + lo + head_dim]
            va = vb = jnp.concatenate([v_self, pos], axis=-1)

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            mr = jnp.max(s, axis=1, keepdims=True)
            er = jnp.exp2(s - mr)
            mc = jnp.max(s, axis=0, keepdims=True)
            ec = jnp.exp2(s - mc)
            if mode == "mxu_sums":
                erb = er.astype(jnp.bfloat16)
                ecb = ec.astype(jnp.bfloat16)
                lr = jax.lax.dot_general(
                    erb, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[:, :1]
                lc = jax.lax.dot_general(
                    ones, ecb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[:1]
                P = (erb * ecb)
            elif mode == "bf16_mul":
                lr = jnp.sum(er, axis=1, keepdims=True)
                lc = jnp.sum(ec, axis=0, keepdims=True)
                P = er.astype(jnp.bfloat16) * ec.astype(jnp.bfloat16)
            else:
                raise ValueError(mode)
            vb_n = (vb.astype(jnp.float32)
                    / lc.reshape(-1, 1)).astype(vb.dtype)
            av = jnp.dot(P, vb_n, preferred_element_type=jnp.float32)
            av = (av / lr).astype(va.dtype)
            f_ref[0, direction, h] = jax.lax.dot_general(
                va, av, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _s_kernel(qkv1_ref, qkv2_ref, pos_ref, f_ref, *, num_heads, head_dim, S):
    """Production math, S pairs per grid instance (combo interleaving)."""
    Cl = num_heads * head_dim
    scale = (head_dim ** -0.5) * _LOG2E
    for b in range(S):
        qkv1 = qkv1_ref[b]
        qkv2 = qkv2_ref[b]
        pos = pos_ref[b].astype(qkv1.dtype)
        for direction in range(2):
            q_src, k_src = (qkv2, qkv1) if direction == 0 else (qkv1, qkv2)
            for h in range(num_heads):
                lo = h * head_dim
                q = q_src[:, lo:lo + head_dim]
                k = k_src[:, Cl + lo:Cl + lo + head_dim]
                v_self = k_src[:, 2 * Cl + lo:2 * Cl + lo + head_dim]
                va = vb = jnp.concatenate([v_self, pos], axis=-1)
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                mr = jnp.max(s, axis=1, keepdims=True)
                er = jnp.exp2(s - mr)
                lr = jnp.sum(er, axis=1, keepdims=True)
                mc = jnp.max(s, axis=0, keepdims=True)
                ec = jnp.exp2(s - mc)
                lc = jnp.sum(ec, axis=0, keepdims=True)
                P = (er * ec).astype(vb.dtype)
                vb_n = (vb.astype(jnp.float32)
                        / lc.reshape(-1, 1)).astype(vb.dtype)
                av = jnp.dot(P, vb_n, preferred_element_type=jnp.float32)
                av = (av / lr).astype(va.dtype)
                f_ref[b, direction, h] = jax.lax.dot_general(
                    va, av, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)


def s_call(qkv1, qkv2, positional, S):
    e = 70
    return pl.pallas_call(
        functools.partial(_s_kernel, num_heads=H, head_dim=64, S=S),
        out_shape=jax.ShapeDtypeStruct((B, 2, H, e, e), jnp.float32),
        grid=(B // S,),
        in_specs=[
            pl.BlockSpec((S, N, 3 * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, N, 3 * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, N, 6), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, 2, H, e, e), lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qkv1, qkv2, positional)


def variant_call(qkv1, qkv2, positional, mode):
    e = 70
    return pl.pallas_call(
        functools.partial(_variant_kernel, num_heads=H, head_dim=64,
                          mode=mode),
        out_shape=jax.ShapeDtypeStruct((B, 2, H, e, e), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, 3 * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3 * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 6), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, H, e, e), lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(qkv1, qkv2, positional)


def main():
    rng = np.random.default_rng(0)
    qkv1 = jnp.asarray(rng.standard_normal((B, N, 3 * C)).astype(
        np.float32)).astype(jnp.bfloat16)
    qkv2 = jnp.asarray(rng.standard_normal((B, N, 3 * C)).astype(
        np.float32)).astype(jnp.bfloat16)
    pos = jnp.asarray(rng.standard_normal((B, N, 6)).astype(
        np.float32)).astype(jnp.bfloat16)

    def run_current(a, b, p):
        return _essential_block_call(a, b, p, H, False, False, True)

    def run_single(a, b, p):
        return _essential_block_call(a, b, p, H, False, True, True)

    cases = [
        ("current(dual)", run_current),
        ("s2", lambda a, b, p: s_call(a, b, p, 2)),
        ("s4", lambda a, b, p: s_call(a, b, p, 4)),
    ]
    if os.environ.get("BENCH_ALL"):
        cases += [
            ("single_softmax", run_single),
            ("mxu_sums", lambda a, b, p: variant_call(a, b, p, "mxu_sums")),
            ("bf16_mul", lambda a, b, p: variant_call(a, b, p, "bf16_mul")),
        ]

    import sys
    for name, fn in cases:
        @jax.jit
        def loop(a, b, p):
            def body(_, carry):
                a2 = a + (1e-30 * carry).astype(a.dtype)
                return jnp.float32(
                    jnp.sum(fn(a2, b, p).astype(jnp.float32)) * 1e-30)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        float(loop(qkv1, qkv2, pos))  # compile
        t0 = time.perf_counter()
        float(loop(qkv1, qkv2, pos))
        ms = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:>16}: {ms:8.3f} ms"); sys.stdout.flush()


if __name__ == "__main__":
    main()
