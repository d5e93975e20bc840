#!/usr/bin/env python
"""Benchmark: eval-forward throughput of the flagship ViTEss on one chip.

Prints ONE JSON line:
  {"metric": "eval_pairs_per_sec_per_chip", "value": N, "unit": "pairs/s",
   "vs_baseline": N / 5000.0}

Baseline: the north-star target from BASELINE.md — 5,000 image pairs/sec/chip
at 256px eval on TPU v5e (the reference publishes no in-repo throughput; its
eval loop is unbatched PyTorch on a GTX 1080 Ti).

Protocol: 256x256 input pairs (InteriorNet/StreetLearn eval resolution),
bf16 compute path, batched jitted forward including in-graph preprocessing
(BGR flip, ImageNet normalize, nearest resize to 224) — the full eval compute
except host-side JPEG decode.
"""

import json
import os
import time

import numpy as np


def main():
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))

    from rel_pose_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from rel_pose_tpu.config import ModelConfig
    from rel_pose_tpu.models import vitess_init, vitess_forward

    cfg = ModelConfig(compute_dtype="bfloat16")
    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    # uint8 BGR: what image decode actually hands the device path (the
    # fp32 conversion happens in-graph; bitwise-identical poses, see
    # tests/test_model.py::test_uint8_input_matches_float)
    images = jnp.asarray(
        rng.integers(0, 256, (batch, 2, 3, 256, 256), dtype=np.uint8))
    intrinsics = jnp.asarray(np.tile(
        np.array([[128.0, 128.0, 128.0, 128.0]], dtype=np.float32),
        (batch, 2, 1)))

    # Chain `iters` forwards inside ONE device program: the tunneled TPU
    # adds large per-call RTT and its block_until_ready does not actually
    # block, so honest timing = one jit call with an on-device loop + one
    # host transfer at the end.  Each iteration's conv1 weights get a
    # denormal-scale nudge from the previous result: a ~9 KB add that makes
    # every downstream op carry-dependent, so XLA can neither hoist the
    # forward out of the loop nor dead-code-eliminate iterations.  (An
    # optimization_barrier is NOT enough — XLA splits tuple barriers
    # per-element and hoists; coupling through the full-size images costs a
    # measurable per-iteration elementwise pass.)
    @jax.jit
    def fwd_loop(params, bn_state, images, intrinsics):
        def body(_, carry):
            w = params["resnet"]["conv1"]["w"]
            nudged = (w.astype(jnp.float32)
                      + 1e-30 * carry[0, 0, 0]).astype(w.dtype)
            p = dict(params, resnet=dict(params["resnet"],
                                         conv1={"w": nudged}))
            poses, _ = vitess_forward(p, bn_state, cfg, images,
                                      intrinsics, training=False)
            return poses
        init = jnp.zeros((batch, 2, 7), jnp.float32)
        return jax.lax.fori_loop(0, iters, body, init)

    np.asarray(fwd_loop(params, bn_state, images, intrinsics))  # compile

    t0 = time.perf_counter()
    out = np.asarray(fwd_loop(params, bn_state, images, intrinsics))
    dt = time.perf_counter() - t0
    assert np.isfinite(out).all()

    pairs_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "eval_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
