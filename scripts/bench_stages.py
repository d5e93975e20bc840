#!/usr/bin/env python
"""Per-stage timing of the eval forward on the real TPU.

Times cumulative prefixes of the network (preprocess -> stem -> layer1 ->
layer2 -> extractor -> +vit -> +cross -> full) with an on-device fori_loop,
so stage cost = difference of consecutive prefixes.  Mirrors bench.py's
protocol exactly: uint8 BGR input, normalization folded into conv1, and
carry coupling through the (3-element) mean constant so XLA can neither
hoist the body nor dead-code iterations (optimization_barrier is NOT
reliable for this — see bench.py).  Not part of the test suite — a
profiling tool for kernel work.
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
from rel_pose_tpu.models.vitess import _cross_block
from rel_pose_tpu.nn.layers import layernorm_apply, max_pool_2d, conv_bn_apply
from rel_pose_tpu.nn.resnet import _basic_block_apply
from rel_pose_tpu.nn.extractor import residual_block_apply
from rel_pose_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD, nearest_resize

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
ITERS = int(os.environ.get("BENCH_ITERS", "30"))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")


def main():
    cfg = ModelConfig(compute_dtype=DTYPE)
    params, state = vitess_init(jax.random.PRNGKey(0), cfg)
    dt = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (BATCH, 2, 3, 256, 256), dtype=np.uint8))
    intr = jnp.asarray(np.tile(
        np.array([[128.0, 128.0, 128.0, 128.0]], np.float32), (BATCH, 2, 1)))

    mean_bgr = jnp.asarray([255.0 * m for m in IMAGENET_MEAN[::-1]],
                           dt).reshape(3, 1, 1)
    w1 = params["resnet"]["conv1"]["w"]
    inv_std_bgr = jnp.asarray(
        [1.0 / (255.0 * s) for s in IMAGENET_STD[::-1]],
        w1.dtype).reshape(1, 3, 1, 1)
    conv1_folded = dict(params["resnet"]["conv1"],
                        w=w1[:, ::-1] * inv_std_bgr)

    # mirrors the model's eval path: s2d phase resize + folded 4x4/s1
    # phase conv (models/vitess.py s2d gate); set RELPOSE_NO_S2D_STEM=1
    # to profile the plain resize + 7x7/s2 variant
    s2d = not os.environ.get("RELPOSE_NO_S2D_STEM")

    def pre(mean, images):
        from rel_pose_tpu.ops.image import s2d_nearest_resize
        x = images.reshape((BATCH * 2,) + images.shape[2:])
        x = s2d_nearest_resize(x, 224) if s2d else nearest_resize(x, 224)
        m = jnp.tile(mean, (4, 1, 1)) if s2d else mean
        return x.astype(dt) - m

    def stem(mean, x):
        p, s = params["resnet"], state["resnet"]
        if s2d:
            from rel_pose_tpu.nn.resnet import fold_stem_s2d
            from rel_pose_tpu.nn.layers import conv2d_apply
            w2, bias = fold_stem_s2d(conv1_folded, p["bn1"], s["bn1"])
            y = conv2d_apply({"w": w2, "b": bias}, x, stride=1,
                             padding=((2, 1), (2, 1)))
        else:
            y, _ = conv_bn_apply(conv1_folded, p["bn1"], s["bn1"], x, False,
                                 stride=2, padding=3)
        y = jax.nn.relu(y)
        return max_pool_2d(y, window=3, stride=2, padding=1)

    def layer1(mean, x):
        p, s = params["resnet"], state["resnet"]
        y, _ = _basic_block_apply(p["layer1_0"], s["layer1_0"], x, 1, False)
        y, _ = _basic_block_apply(p["layer1_1"], s["layer1_1"], y, 1, False)
        return y

    def layer2(mean, x):
        p, s = params["resnet"], state["resnet"]
        y, _ = _basic_block_apply(p["layer2_0"], s["layer2_0"], x, 2, False)
        y, _ = _basic_block_apply(p["layer2_1"], s["layer2_1"], y, 1, False)
        return y

    def extractor(mean, x):
        y, _ = residual_block_apply(params["extractor_final_conv"],
                                    state["extractor_final_conv"], x, False)
        return y

    def tokens(mean, x):
        x = x.reshape(BATCH * 2, cfg.total_num_features, cfg.num_patches)
        return jnp.swapaxes(x, 1, 2)

    def vit(mean, x):
        from rel_pose_tpu.ops.pallas_vit import fused_vit_stack
        x = x + params["pos_embed"].astype(x.dtype)
        return fused_vit_stack(x, params["blocks"], cfg.num_heads)

    def cross(mean, x):
        intr_scaled = intr * (24.0 / 256.0)
        x = _cross_block(params["cross_block"], cfg, x, intr_scaled)
        return layernorm_apply(params["norm"], x)

    def regress(mean, x):
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
                # every iteration's FIRST op depends on the previous
                # result through the tiny mean constant -> no hoisting
                mean = mean_bgr + (1e-30 * carry).astype(dt)
                x = images
                for f in fns:
                    x = f(mean, x)
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
