#!/usr/bin/env python
"""Microbench: preprocess variants + stem conv/pool split on the real TPU.

Uses the carry-through-constant coupling from bench_stages.py (an
optimization_barrier is NOT reliable).  Profiling tool only.
"""

import os
import time

import numpy as np

from rel_pose_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from rel_pose_tpu.config import ModelConfig
from rel_pose_tpu.models import vitess_init
from rel_pose_tpu.nn.layers import max_pool_2d, conv_bn_apply
from rel_pose_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD, nearest_resize

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
ITERS = int(os.environ.get("BENCH_ITERS", "30"))


def main():
    cfg = ModelConfig(compute_dtype="bfloat16")
    params, state = vitess_init(jax.random.PRNGKey(0), cfg)
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (BATCH, 2, 3, 256, 256), dtype=np.uint8))
    x224 = jnp.asarray(rng.standard_normal(
        (BATCH * 2, 3, 224, 224)).astype(np.float32)).astype(dt)
    x112 = jnp.asarray(rng.standard_normal(
        (BATCH * 2, 64, 112, 112)).astype(np.float32)).astype(dt)

    mean_bgr = jnp.asarray([255.0 * m for m in IMAGENET_MEAN[::-1]],
                           dt).reshape(3, 1, 1)
    w1 = params["resnet"]["conv1"]["w"]
    inv_std = jnp.asarray([1.0 / (255.0 * s) for s in IMAGENET_STD[::-1]],
                          w1.dtype).reshape(1, 3, 1, 1)
    conv1_folded = dict(params["resnet"]["conv1"], w=w1[:, ::-1] * inv_std)

    def pre_current(c, images):
        x = images.reshape((BATCH * 2,) + images.shape[2:])
        x = nearest_resize(x, 224)
        return x.astype(dt) - (mean_bgr + c)

    def pre_cast_first(c, images):
        x = images.reshape((BATCH * 2,) + images.shape[2:])
        x = x.astype(dt) - (mean_bgr + c)
        return nearest_resize(x, 224)

    def pre_noresize(c, images):
        x = images.reshape((BATCH * 2,) + images.shape[2:])
        x = x.astype(dt) - (mean_bgr + c)
        return x[:, :, :224, :224]

    def pre_resize_only(c, images):
        x = images.reshape((BATCH * 2,) + images.shape[2:])
        return nearest_resize(x + c.astype(jnp.uint8), 224)

    # W-axis nearest resize as a one-hot selection MATMUL: minor-dim
    # slices/gathers relayout (the 8->7 block pattern is not 128-aligned),
    # but a (256, 224) one-hot matmul runs on the MXU and is exact (one
    # nonzero per output column -> bf16 sums are exact selections).
    idx_w = (np.arange(224) * 256) // 224
    sel_w = np.zeros((256, 224), np.float32)
    sel_w[idx_w, np.arange(224)] = 1.0
    sel_w = jnp.asarray(sel_w, dt)

    def pre_matmul_w(c, images):
        x = images.reshape((BATCH * 2,) + images.shape[2:])
        x = nearest_resize(x, (224, 256))          # H rows: cheap u8 slice
        x = x.astype(dt) - (mean_bgr + c)
        return jax.lax.dot_general(x, sel_w, (((3,), (0,)), ((), ())),
                                   preferred_element_type=dt)

    def pre_gather_w(c, images):
        x = images.reshape((BATCH * 2,) + images.shape[2:])
        x = nearest_resize(x, (224, 256))
        x = x.astype(dt) - (mean_bgr + c)
        return jnp.take(x, jnp.asarray(idx_w), axis=3)

    def conv_only(c, x):
        p, s = params["resnet"], state["resnet"]
        y, _ = conv_bn_apply(conv1_folded, p["bn1"], s["bn1"], x + c[:1],
                             False, stride=2, padding=3)
        return jax.nn.relu(y)

    def conv_pool(c, x):
        return max_pool_2d(conv_only(c, x), window=3, stride=2, padding=1)

    def pool_only(c, x):
        return max_pool_2d(x + c[:1, :1], window=3, stride=2, padding=1)

    def pool_slices(x):
        """maxpool 3x3 s2 p1 via shifted strided slices + elementwise max
        (separable, torch edge semantics: pad -inf)."""
        def pool_axis(x, ax):
            n = x.shape[ax]
            a = jax.lax.slice_in_dim(x, 0, n - 1, stride=2, axis=ax)
            b = jax.lax.slice_in_dim(x, 1, n, stride=2, axis=ax)
            m = jnp.maximum(a, b)            # taps 2i, 2i+1
            c = jax.lax.slice_in_dim(x, 1, n - 1, stride=2, axis=ax)
            # taps 2i-1: shift c by one output position (out i gets x[2i-1])
            pad = [(0, 0)] * x.ndim
            pad[ax] = (1, 0)
            c = jnp.pad(c, pad, constant_values=-jnp.inf)
            c = jax.lax.slice_in_dim(c, 0, m.shape[ax], axis=ax)
            return jnp.maximum(m, c)
        return pool_axis(pool_axis(x, 2), 3)

    def conv_pool_slices(c, x):
        return pool_slices(conv_only(c, x))

    def pool_slices_only(c, x):
        return pool_slices(x + c[:1, :1])

    cases = [
        ("pre_current", pre_current, images),
        ("pre_cast_first", pre_cast_first, images),
        ("pre_noresize(crop)", pre_noresize, images),
        ("pre_resize_only(u8)", pre_resize_only, images),
        ("pre_matmul_w", pre_matmul_w, images),
        ("pre_gather_w", pre_gather_w, images),
        ("conv_bn_relu", conv_only, x224),
        ("conv_bn_relu+pool", conv_pool, x224),
        ("pool_only(112)", pool_only, x112),
        ("conv+pool_slices", conv_pool_slices, x224),
        ("pool_slices_only", pool_slices_only, x112),
    ]

    for name, fn, arg in cases:
        @jax.jit
        def loop(arg):
            def body(_, carry):
                c = (1e-30 * carry).astype(dt).reshape(1, 1, 1)
                r = fn(c, arg)
                return jnp.float32(jnp.sum(r.astype(jnp.float32)) * 1e-30)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        float(loop(arg))  # compile
        t0 = time.perf_counter()
        float(loop(arg))
        ms = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:>22}: {ms:8.3f} ms")


if __name__ == "__main__":
    main()
