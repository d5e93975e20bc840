#!/usr/bin/env python
"""Microbench preprocessing variants on the TPU (profiling tool)."""

import math
import time

import numpy as np

from rel_pose_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from rel_pose_tpu.ops.image import nearest_resize, preprocess_images

B = 256
ITERS = 50


def resize_gcd(x, size):
    """Nearest resize via per-axis reshape + tiny block gather (slice when
    the block indices are contiguous)."""
    if isinstance(size, int):
        size = (size, size)
    out_h, out_w = size
    in_h, in_w = x.shape[-2], x.shape[-1]

    def axis_take(x, axis, n_in, n_out):
        if n_in == n_out:
            return x
        g = math.gcd(n_in, n_out)
        bi, bo = n_in // g, n_out // g
        idx = (np.arange(bo) * bi) // bo
        shape = x.shape
        ax = axis % x.ndim
        x = x.reshape(shape[:ax] + (g, bi) + shape[ax + 1:])
        if np.array_equal(idx, np.arange(bo)):
            x = jax.lax.slice_in_dim(x, 0, bo, axis=ax + 1)
        else:
            x = jnp.take(x, jnp.asarray(idx), axis=ax + 1)
        return x.reshape(shape[:ax] + (n_out,) + shape[ax + 1:])

    x = axis_take(x, -2, in_h, out_h)
    return axis_take(x, -1, in_w, out_w)


def main():
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (B, 2, 3, 256, 256)).astype(np.float32))

    def v_current(images):
        x = images.reshape((B * 2,) + images.shape[2:])
        x = nearest_resize(x, 224)
        x = x.astype(jnp.bfloat16)
        return preprocess_images(x)

    def v_gcd(images):
        x = images.reshape((B * 2,) + images.shape[2:])
        x = resize_gcd(x, 224)
        x = x.astype(jnp.bfloat16)
        return preprocess_images(x)

    def v_gcd_cast_first(images):
        x = images.reshape((B * 2,) + images.shape[2:])
        x = x.astype(jnp.bfloat16)
        x = resize_gcd(x, 224)
        return preprocess_images(x)

    def v_noresize(images):
        x = images.reshape((B * 2,) + images.shape[2:])
        x = x.astype(jnp.bfloat16)
        return preprocess_images(x)

    variants = [("current", v_current), ("gcd", v_gcd),
                ("gcd_cast_first", v_gcd_cast_first),
                ("noresize(floor)", v_noresize)]

    # correctness first
    ref = np.asarray(jax.jit(v_current)(images), np.float32)
    got = np.asarray(jax.jit(v_gcd)(images), np.float32)
    print("gcd max diff vs current:", np.abs(ref - got).max())

    for name, fn in variants:
        @jax.jit
        def loop(images, fn=fn):
            def body(_, c):
                y = fn(images + 1e-30 * c)
                return jnp.float32(jnp.sum(y) * 1e-30)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        float(loop(images))
        t0 = time.perf_counter()
        float(loop(images))
        ms = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:>16}: {ms:7.3f} ms")


if __name__ == "__main__":
    main()
