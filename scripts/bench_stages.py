#!/usr/bin/env python
"""Per-stage timing of the eval forward on the real TPU.

Times cumulative prefixes of the network (preprocess -> stem -> layer1 ->
layer2 -> extractor -> +vit -> +cross -> full) with an on-device fori_loop,
so stage cost = difference of consecutive prefixes.  Not part of the test
suite — a profiling tool for kernel work.
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
from rel_pose_tpu.models.vitess import _extract_features, _cross_block
from rel_pose_tpu.nn.layers import layernorm_apply, max_pool_2d, conv_bn_apply
from rel_pose_tpu.nn.resnet import _basic_block_apply
from rel_pose_tpu.nn.extractor import residual_block_apply
from rel_pose_tpu.ops.image import preprocess_images, nearest_resize

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
ITERS = int(os.environ.get("BENCH_ITERS", "30"))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")


def main():
    cfg = ModelConfig(compute_dtype=DTYPE)
    params, state = vitess_init(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (BATCH, 2, 3, 256, 256)).astype(np.float32))
    intr = jnp.asarray(np.tile(
        np.array([[128.0, 128.0, 128.0, 128.0]], np.float32), (BATCH, 2, 1)))

    def pre(images):
        x = images.reshape((BATCH * 2,) + images.shape[2:])
        x = nearest_resize(x, 224)
        if cfg.compute_dtype == "bfloat16":
            x = x.astype(jnp.bfloat16)
        return preprocess_images(x)

    def stem(x):
        p, s = params["resnet"], state["resnet"]
        y, _ = conv_bn_apply(p["conv1"], p["bn1"], s["bn1"], x, False,
                             stride=2, padding=3)
        y = jax.nn.relu(y)
        return max_pool_2d(y, window=3, stride=2, padding=1)

    def layer1(x):
        p, s = params["resnet"], state["resnet"]
        y, _ = _basic_block_apply(p["layer1_0"], s["layer1_0"], x, 1, False)
        y, _ = _basic_block_apply(p["layer1_1"], s["layer1_1"], y, 1, False)
        return y

    def layer2(x):
        p, s = params["resnet"], state["resnet"]
        y, _ = _basic_block_apply(p["layer2_0"], s["layer2_0"], x, 2, False)
        y, _ = _basic_block_apply(p["layer2_1"], s["layer2_1"], y, 1, False)
        return y

    def extractor(x):
        y, _ = residual_block_apply(params["extractor_final_conv"],
                                    state["extractor_final_conv"], x, False)
        return y

    def tokens(x):
        x = x.reshape(BATCH * 2, cfg.total_num_features, cfg.num_patches)
        return jnp.swapaxes(x, 1, 2)

    def vit(x):
        from rel_pose_tpu.ops.pallas_vit import fused_vit_stack
        x = x + params["pos_embed"].astype(x.dtype)
        return fused_vit_stack(x, params["blocks"], cfg.num_heads)

    def cross(x):
        intr_scaled = intr * (24.0 / 256.0)
        x = _cross_block(params["cross_block"], cfg, x, intr_scaled)
        return layernorm_apply(params["norm"], x)

    def regress(x):
        from rel_pose_tpu.nn.layers import linear_apply
        flat = x.reshape(BATCH, -1).astype(jnp.float32)
        y = jax.nn.relu(linear_apply(params["pose_regressor"]["fc1"], flat))
        y = jax.nn.relu(linear_apply(params["pose_regressor"]["fc2"], y))
        return linear_apply(params["pose_regressor"]["fc3"], y)

    stages = [("pre", pre), ("stem", stem), ("layer1", layer1),
              ("layer2", layer2), ("extractor", extractor),
              ("tokens", tokens), ("vit", vit), ("cross", cross),
              ("regress", regress)]

    def time_prefix(n):
        fns = [f for _, f in stages[:n]]

        @jax.jit
        def loop(images):
            def body(_, carry):
                x, _ = jax.lax.optimization_barrier((images, carry))
                for f in fns:
                    x = f(x)
                return jnp.float32(jnp.sum(x) * 1e-30)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        float(loop(images))  # compile
        t0 = time.perf_counter()
        float(loop(images))
        return (time.perf_counter() - t0) / ITERS * 1000

    prev = 0.0
    print(f"batch={BATCH} iters={ITERS} dtype={DTYPE}")
    for n in range(1, len(stages) + 1):
        ms = time_prefix(n)
        print(f"prefix {stages[n-1][0]:>10}: {ms:8.3f} ms  "
              f"(stage ~{ms - prev:7.3f} ms)")
        prev = ms


if __name__ == "__main__":
    main()
