#!/usr/bin/env python
"""Hardware gradient check: fused Pallas kernels vs the unfused XLA path.

Runs the FULL train-loss gradient (geodesic loss through ViTEss) twice on
the real TPU — once with the Pallas kernels engaged, once with
RELPOSE_NO_PALLAS — and reports per-leaf max abs/rel differences.  Round 1
verified the backward megakernels on hardware at bf16 only; this script is
the fp32 evidence (VERDICT weak #5).

Env: CHECK_DTYPE (float32|bfloat16), CHECK_BATCH (default 4).
"""

import os

import numpy as np

from rel_pose_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from rel_pose_tpu.config import ModelConfig
from rel_pose_tpu.models import vitess_init
from rel_pose_tpu.train.step import make_loss_fn
from rel_pose_tpu.utils.gradcheck import triangulate, report


def main():
    dtype = os.environ.get("CHECK_DTYPE", "float32")
    B = int(os.environ.get("CHECK_BATCH", "4"))
    cfg = ModelConfig(compute_dtype=dtype)
    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
    # Condition the comparison: at random init the predicted quaternions sit
    # near the max(|q|, 0.01) floor (src/model.py:152), where a ~1e-3
    # forward precision difference (fp32 matmuls are bf16x3/TF32-class on
    # TPU, like torch-on-Ampere fp32) flips the branch and makes raw grad
    # diffs meaningless.  Biasing fc3 so quats come out near unit norm puts
    # the loss in its smooth regime — the regime training actually lives in.
    fc3_b = np.array(params["pose_regressor"]["fc3"]["b"])
    fc3_b[6] = 1.0
    fc3_b[13] = 1.0
    params["pose_regressor"]["fc3"]["b"] = jnp.asarray(fc3_b)
    loss_fn = make_loss_fn(cfg, 10.0, 10.0, "train")

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (B, 2, 3, 384, 512)).astype(np.float32))
    poses = np.zeros((B, 2, 7), np.float32)
    poses[..., 6] = 1.0
    poses[:, 1, 0] = 0.3
    poses[:, 1, 4] = 0.2
    poses[:, 1, 6] = np.sqrt(1 - 0.04)
    poses = jnp.asarray(poses)
    intr = jnp.asarray(np.tile(
        np.array([[517.97, 517.97, 320, 240]], np.float32), (B, 2, 1)))

    def grads(no_pallas=False, precision=None):
        if no_pallas:
            os.environ["RELPOSE_NO_PALLAS"] = "1"
        try:
            if precision:
                with jax.default_matmul_precision(precision):
                    g = jax.jit(jax.grad(
                        lambda p: loss_fn(p, bn_state, images, poses,
                                          intr, True)[0]))(params)
            else:
                g = jax.jit(jax.grad(
                    lambda p: loss_fn(p, bn_state, images, poses,
                                      intr, True)[0]))(params)
            return jax.tree.map(np.asarray, jax.device_get(g))
        finally:
            os.environ.pop("RELPOSE_NO_PALLAS", None)

    assert "RELPOSE_NO_PALLAS" not in os.environ
    g_fused = grads()
    # Yardstick triangulation: compare BOTH the fused kernels and the
    # default-precision XLA path against a 'highest'-precision (bf16x6,
    # near-exact-fp32 MXU) unfused reference.  On TPU, fp32 matmuls at the
    # backend default are single-pass-bf16-class, so fused-vs-default alone
    # cannot distinguish kernel bugs from shared MXU rounding; the fused
    # path passes if it is no farther from the near-exact reference than
    # the stock XLA path is (x3 headroom), or under the absolute tol.
    g_def = grads(no_pallas=True)
    g_hi = grads(no_pallas=True, precision="highest")

    # Per-leaf triangulation (norm-weighted rel + cosine, gated against
    # the SAME leaf's stock-XLA error — see utils/gradcheck.py for why
    # max-over-leaves was too blunt): a transcription bug perturbs
    # specific leaves far beyond the rounding noise stock XLA shows on
    # those exact leaves, which a global max cannot see.
    if dtype == "float32":
        normrel_tol, cos_min = 5e-3, 0.999
    else:
        normrel_tol, cos_min = 5e-2, 0.99
    ok, failures, fused_rows, stock_rows = triangulate(
        g_fused, g_def, g_hi,
        headroom=3.0, normrel_tol=normrel_tol, cos_min=cos_min)
    print(f"dtype={dtype} batch={B}: per-leaf triangulation vs "
          f"highest-precision ref")
    report("fused Pallas path", fused_rows)
    report("unfused default-precision XLA path (noise yardstick)",
           stock_rows)
    status = "OK" if ok else "FAIL"
    print(f"{status}: gates normrel<=max(3x stock same-leaf, "
          f"{normrel_tol}) and cos>={cos_min} on every leaf")
    for f in failures:
        print(f"  FAILED {f}")


if __name__ == "__main__":
    main()
