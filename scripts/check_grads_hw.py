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

    names = [jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_leaves_with_path(g_hi)]
    ref = jax.tree.leaves(g_hi)
    gscale = max(float(np.abs(r).max()) for r in ref)

    def rel_diffs(g):
        out = []
        for a, b, n in zip(jax.tree.leaves(g), ref, names):
            # leaves whose true grad is ~0 relative to the global grad
            # scale (conv biases feeding BatchNorm: mean-subtraction
            # makes their gradient analytically zero) carry only float
            # noise — scale them by the global magnitude instead
            denom = max(float(np.abs(b).max()), 1e-4 * gscale)
            out.append((float(np.max(np.abs(a - b))) / denom,
                        float(np.max(np.abs(a - b))), n))
        out.sort(reverse=True)
        return out

    w_fused = rel_diffs(g_fused)
    w_def = rel_diffs(g_def)
    print(f"dtype={dtype} batch={B}: top-5 diffs vs highest-precision ref")
    print("  fused Pallas path:")
    for rel, absd, name in w_fused[:5]:
        print(f"    rel={rel:9.3e} abs={absd:9.3e}  {name}")
    print("  unfused default-precision XLA path (noise yardstick):")
    for rel, absd, name in w_def[:5]:
        print(f"    rel={rel:9.3e} abs={absd:9.3e}  {name}")
    max_fused, max_def = w_fused[0][0], w_def[0][0]
    tol = 5e-3 if dtype == "float32" else 5e-2
    ok = max_fused < max(3.0 * max_def, tol)
    status = "OK" if ok else "FAIL"
    print(f"{status}: fused max rel {max_fused:.3e} vs yardstick "
          f"{max_def:.3e} (abs tol {tol})")


if __name__ == "__main__":
    main()
