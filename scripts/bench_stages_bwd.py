#!/usr/bin/env python
"""Per-stage timing of the TRAIN forward+backward on the real TPU.

Times jax.value_and_grad (wrt params) of cumulative prefixes of the
training-mode network; stage fwd+bwd cost = difference of consecutive
prefixes.  Grads of every leaf are consumed through the loop carry so XLA
cannot dead-code the backward (see bench_train.py).  Profiling tool only.

Env: BENCH_BATCH (default 60), BENCH_ITERS (default 10),
BENCH_DTYPE (float32|bfloat16).
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
from rel_pose_tpu.nn.layers import layernorm_apply, max_pool_2d, \
    conv_bn_apply, linear_apply
from rel_pose_tpu.nn.resnet import _basic_block_apply
from rel_pose_tpu.nn.extractor import residual_block_apply
from rel_pose_tpu.ops.image import preprocess_images, nearest_resize

BATCH = int(os.environ.get("BENCH_BATCH", "60"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))
DTYPE = os.environ.get("BENCH_DTYPE", "float32")


def main():
    cfg = ModelConfig(compute_dtype=DTYPE)
    params, state = vitess_init(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    # uint8, matching what the loader actually ships to the train step
    images = jnp.asarray(
        rng.integers(0, 256, (BATCH, 2, 3, 384, 512), dtype=np.uint8))
    intr = jnp.asarray(np.tile(
        np.array([[517.97, 517.97, 320, 240]], np.float32), (BATCH, 2, 1)))

    def pre(p, images):
        x = images.reshape((BATCH * 2,) + images.shape[2:])
        x = nearest_resize(x, 224)
        if cfg.compute_dtype == "bfloat16":
            x = x.astype(jnp.bfloat16)
        return preprocess_images(x)

    def stem(p, x):
        pr, s = p["resnet"], state["resnet"]
        y, _ = conv_bn_apply(pr["conv1"], pr["bn1"], s["bn1"], x, True,
                             stride=2, padding=3)
        y = jax.nn.relu(y)
        return max_pool_2d(y, window=3, stride=2, padding=1)

    def layer1(p, x):
        pr, s = p["resnet"], state["resnet"]
        y, _ = _basic_block_apply(pr["layer1_0"], s["layer1_0"], x, 1, True)
        y, _ = _basic_block_apply(pr["layer1_1"], s["layer1_1"], y, 1, True)
        return y

    def layer2(p, x):
        pr, s = p["resnet"], state["resnet"]
        y, _ = _basic_block_apply(pr["layer2_0"], s["layer2_0"], x, 2, True)
        y, _ = _basic_block_apply(pr["layer2_1"], s["layer2_1"], y, 1, True)
        return y

    def extractor(p, x):
        y, _ = residual_block_apply(p["extractor_final_conv"],
                                    state["extractor_final_conv"], x, True)
        return y

    def tokens(p, x):
        x = x.reshape(BATCH * 2, cfg.total_num_features, cfg.num_patches)
        return jnp.swapaxes(x, 1, 2)

    def vit(p, x):
        from rel_pose_tpu.ops.pallas_vit import fused_vit_stack
        x = x + p["pos_embed"].astype(x.dtype)
        return fused_vit_stack(x, p["blocks"], cfg.num_heads)

    def cross(p, x):
        intr_scaled = intr * jnp.asarray(
            [24.0 / 512, 24.0 / 384, 24.0 / 512, 24.0 / 384], jnp.float32)
        x = _cross_block(p["cross_block"], cfg, x, intr_scaled)
        return layernorm_apply(p["norm"], x)

    def regress(p, x):
        flat = x.reshape(BATCH, -1).astype(jnp.float32)
        y = jax.nn.relu(linear_apply(p["pose_regressor"]["fc1"], flat))
        y = jax.nn.relu(linear_apply(p["pose_regressor"]["fc2"], y))
        return linear_apply(p["pose_regressor"]["fc3"], y)

    stages = [("pre", pre), ("stem", stem), ("layer1", layer1),
              ("layer2", layer2), ("extractor", extractor),
              ("tokens", tokens), ("vit", vit), ("cross", cross),
              ("regress", regress)]

    def time_prefix(n):
        fns = [f for _, f in stages[:n]]

        def scalar(p, images):
            x = images
            for f in fns:
                x = f(p, x)
            return jnp.sum(x.astype(jnp.float32))

        @jax.jit
        def loop(p, images):
            def body(_, p):
                val, grads = jax.value_and_grad(scalar)(p, images)
                gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
                q = jax.tree.map(lambda x: x, p)
                q["resnet"] = dict(q["resnet"])
                q["resnet"]["conv1"] = {
                    "w": q["resnet"]["conv1"]["w"] + 1e-30 * (val + gsum)}
                return q
            return jax.lax.fori_loop(0, ITERS, body, p)

        out = loop(params, images)  # compile
        jax.block_until_ready(jax.device_get(
            out["resnet"]["conv1"]["w"]))
        t0 = time.perf_counter()
        out = loop(params, images)
        jax.device_get(out["resnet"]["conv1"]["w"])
        return (time.perf_counter() - t0) / ITERS * 1000

    prev = 0.0
    print(f"batch={BATCH} iters={ITERS} dtype={DTYPE} (fwd+bwd per prefix)")
    for n in range(1, len(stages) + 1):
        ms = time_prefix(n)
        print(f"prefix {stages[n-1][0]:>10}: {ms:8.3f} ms  "
              f"(stage ~{ms - prev:7.3f} ms)")
        prev = ms


if __name__ == "__main__":
    main()
