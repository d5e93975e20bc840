#!/usr/bin/env python
"""A/B: NCHW vs NHWC dimension numbers for the trunk's 3x3 convs.

layer1+layer2 run at 61-74% MXU (docs/PROFILE.md).  XLA picks internal
layouts, but the user-facing dimension_numbers can still change the
emitted convolution strategy; this measures a basic-block-shaped chain
(conv3x3 -> scale+shift -> relu, twice) both ways at eval batch.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_convlayout.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rel_pose_tpu.utils.platform import enable_compilation_cache, \
    apply_platform_env

apply_platform_env()
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("BENCH_BATCH", "512"))
ITERS = int(os.environ.get("BENCH_ITERS", "30"))
DT = jnp.bfloat16


def chain(x, w1, w2, dims):
    for w in (w1, w2):
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=dims)
        x = jax.nn.relu(x * 1.0009765625 + 0.0625)
    return x


def bench(name, make):
    x, w1, w2, dims = make()

    @jax.jit
    def loop(x, w1, w2):
        def body(_, carry):
            w1n = (w1.astype(jnp.float32) + 1e-30 * carry).astype(DT)
            y = chain(x, w1n, w2, dims)
            return jnp.float32(jnp.sum(y) * 1e-30)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(x, w1, w2))
    t0 = time.perf_counter()
    float(loop(x, w1, w2))
    ms = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:>28}: {ms:7.3f} ms")


def main():
    rng = np.random.default_rng(0)
    for C, HW in ((64, 56), (128, 28)):
        xw = rng.standard_normal((B, C, HW, HW)).astype(np.float32) * 0.1
        w1n = rng.standard_normal((C, C, 3, 3)).astype(np.float32) * 0.05
        w2n = rng.standard_normal((C, C, 3, 3)).astype(np.float32) * 0.05

        def make_nchw():
            return (jnp.asarray(xw, DT), jnp.asarray(w1n, DT),
                    jnp.asarray(w2n, DT), ("NCHW", "OIHW", "NCHW"))

        def make_nhwc():
            return (jnp.asarray(np.transpose(xw, (0, 2, 3, 1)), DT),
                    jnp.asarray(np.transpose(w1n, (2, 3, 1, 0)), DT),
                    jnp.asarray(np.transpose(w2n, (2, 3, 1, 0)), DT),
                    ("NHWC", "HWIO", "NHWC"))

        bench(f"C={C} {HW}x{HW} NCHW", make_nchw)
        bench(f"C={C} {HW}x{HW} NHWC", make_nhwc)


if __name__ == "__main__":
    main()
