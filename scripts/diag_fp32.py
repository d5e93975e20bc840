#!/usr/bin/env python
"""Localize the fp32 fused-vs-unfused divergence on hardware:
1. forward pose diff (fused vs no-pallas)
2. grad diff with a SMOOTH loss (mean pose^2) — bypasses the geodesic
   loss + quaternion floor branch
3. per-stage: vit stack fwd diff, essential block fwd diff
"""

import os

import numpy as np

from rel_pose_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from rel_pose_tpu.config import ModelConfig
from rel_pose_tpu.models import vitess_init, vitess_forward

DT = os.environ.get("CHECK_DTYPE", "float32")


def with_pallas(flag, fn):
    if flag:
        os.environ.pop("RELPOSE_NO_PALLAS", None)
    else:
        os.environ["RELPOSE_NO_PALLAS"] = "1"
    try:
        return fn()
    finally:
        os.environ.pop("RELPOSE_NO_PALLAS", None)


def main():
    cfg = ModelConfig(compute_dtype=DT)
    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = 4
    images = jnp.asarray(
        rng.uniform(0, 255, (B, 2, 3, 384, 512)).astype(np.float32))
    intr = jnp.asarray(np.tile(
        np.array([[517.97, 517.97, 320, 240]], np.float32), (B, 2, 1)))

    def fwd():
        f = jax.jit(lambda p: vitess_forward(p, bn_state, cfg, images, intr,
                                             training=True)[0])
        return np.asarray(jax.device_get(f(params)))

    p1 = with_pallas(True, fwd)
    p0 = with_pallas(False, fwd)
    print(f"[{DT}] forward pose diff: max abs {np.abs(p1-p0).max():.3e}")

    def smooth_grad():
        def loss(p):
            poses, _ = vitess_forward(p, bn_state, cfg, images, intr,
                                      training=True)
            return jnp.mean(jnp.square(poses))
        g = jax.jit(jax.grad(loss))(params)
        return jax.tree.map(np.asarray, jax.device_get(g))

    g1 = with_pallas(True, smooth_grad)
    g0 = with_pallas(False, smooth_grad)
    worst = []
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g1),
                            jax.tree.leaves(g0)):
        scale = max(float(np.abs(b).max()), 1e-12)
        worst.append((float(np.abs(a - b).max()) / scale,
                      float(np.abs(a - b).max()),
                      jax.tree_util.keystr(path)))
    worst.sort(reverse=True)
    print(f"[{DT}] smooth-loss grad diffs (scaled-by-leaf-max, abs, leaf):")
    for r, a, n in worst[:6]:
        print(f"  {r:9.3e} {a:9.3e}  {n}")

    # stage-level forward diffs
    from rel_pose_tpu.ops.pallas_vit import (fused_vit_stack,
                                             vit_stack_reference,
                                             stack_block_params)
    x = jnp.asarray(rng.normal(size=(8, 576, 192)).astype(np.float32))
    if DT == "bfloat16":
        x = x.astype(jnp.bfloat16)
    stacked = stack_block_params(params["blocks"])
    f_fused = jax.jit(lambda x: fused_vit_stack(x, params["blocks"],
                                                cfg.num_heads))
    r = np.asarray(jax.device_get(f_fused(x)), np.float32)
    stacked = {k: v.astype(x.dtype) for k, v in stacked.items()}
    f_ref = jax.jit(lambda x: vit_stack_reference(
        x, stacked, len(params["blocks"]), cfg.num_heads))
    rr = np.asarray(jax.device_get(f_ref(x)), np.float32)
    print(f"[{DT}] vit stack fwd diff: max abs {np.abs(r-rr).max():.3e} "
          f"(out scale {np.abs(rr).max():.2f})")

    from rel_pose_tpu.ops.pallas_essential_block import (
        fused_essential_block, essential_block_reference)
    qkv1 = jnp.asarray(rng.normal(size=(4, 576, 576)).astype(np.float32))
    qkv2 = jnp.asarray(rng.normal(size=(4, 576, 576)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(4, 576, 6)).astype(np.float32))
    if DT == "bfloat16":
        qkv1, qkv2, pos = (a.astype(jnp.bfloat16) for a in (qkv1, qkv2, pos))
    e1 = np.asarray(jax.device_get(jax.jit(
        lambda a, b, p: fused_essential_block(a, b, p, 3))(qkv1, qkv2, pos)))
    e0 = np.asarray(jax.device_get(jax.jit(
        lambda a, b, p: essential_block_reference(a, b, p, 3))(
            qkv1, qkv2, pos)))
    print(f"[{DT}] essential fwd diff: max abs {np.abs(e1-e0).max():.3e} "
          f"(out scale {np.abs(e0).max():.2f})")


if __name__ == "__main__":
    main()
