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

Train mode (`BENCH_MODE=train`, VERDICT r2 item 6): full forward + backward
+ Adam at the reference's training resolution (384x512, uint8 batches as the
loader ships them), `BENCH_DTYPE` float32 (reference trains fp32-only) or
bfloat16; prints `train_pairs_per_sec_per_chip` with vs_baseline against the
reference's measured-equivalent 10-GPU global batch rate normalized per
device (see BASELINE.md).  Same fori_loop carry discipline as eval: the
optimizer-state carry makes every step data-dependent.
"""

import json
import os
import time

import numpy as np


def bench_train():
    batch = int(os.environ.get("BENCH_BATCH", "60"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")

    from rel_pose_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honors RELPOSE_PLATFORM; also enables the compile cache

    import jax
    import jax.numpy as jnp
    from rel_pose_tpu.config import ModelConfig
    from rel_pose_tpu.models import vitess_init
    from rel_pose_tpu.train import TrainState, make_optimizer
    from rel_pose_tpu.train.step import make_loss_fn

    remat = bool(os.environ.get("BENCH_REMAT"))
    cfg = ModelConfig(compute_dtype=dtype)
    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer()
    state = TrainState.create(params, bn_state, tx)
    loss_fn = make_loss_fn(cfg, 10.0, 10.0, "train", remat=remat)

    rng = np.random.default_rng(0)
    # uint8 images: the loader/augmentor hand uint8 to the device path
    images = jnp.asarray(
        rng.integers(0, 256, (batch, 2, 3, 384, 512), dtype=np.uint8))
    poses = np.zeros((batch, 2, 7), np.float32)
    poses[..., 6] = 1.0
    poses[:, 1, 0] = 0.3
    poses = jnp.asarray(poses)
    intr = jnp.asarray(np.tile(
        np.array([[517.97, 517.97, 320, 240]], np.float32), (batch, 2, 1)))

    @jax.jit
    def loop(state, images, poses, intr):
        def body(_, st):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (new_bn, _, _)), grads = grad_fn(
                st.params, st.bn_state, images, poses, intr, True)
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            new_params = jax.tree.map(lambda p, u: p + u, st.params, updates)
            return st.replace(params=new_params, bn_state=new_bn,
                              opt_state=new_opt, step=st.step + 1)
        return jax.lax.fori_loop(0, iters, body, state)

    out = loop(state, images, poses, intr)
    _ = int(jax.device_get(out.step))  # sync after compile+run

    t0 = time.perf_counter()
    out = loop(out, images, poses, intr)
    _ = int(jax.device_get(out.step))
    dt = time.perf_counter() - t0

    pairs_per_sec = batch * iters / dt
    # baseline: reference's 10x GTX-1080Ti DDP global step — no published
    # number; BASELINE.md's derived ~60 pairs/s/device estimate
    print(json.dumps({
        "metric": "train_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "dtype": dtype,
        "batch": batch,
        "step_ms": round(dt / iters * 1000, 2),
        "vs_baseline": round(pairs_per_sec / 60.0, 4),
    }))


def main():
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))

    from rel_pose_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honors RELPOSE_PLATFORM; also enables the compile cache

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
    if os.environ.get("BENCH_MODE") == "train":
        bench_train()
    else:
        main()
