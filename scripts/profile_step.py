#!/usr/bin/env python
"""Capture + parse a device trace of the eval forward / train step.

Runs the requested step on the real TPU under ``jax.profiler`` and parses
the resulting xplane with ``jax.profiler.ProfileData`` (no TensorBoard
needed — the sandbox's tensorboard_plugin_profile is protobuf-broken),
printing per-op durations aggregated by name.  The printed table is the
profile artifact VERDICT r2 item 4 asked for; paste into docs/PROFILE.md.

Env: PROF_MODE (eval|train), PROF_BATCH (default 256 eval / 60 train),
PROF_DTYPE (default bfloat16 eval / float32 train), PROF_DIR, PROF_ITERS.
"""

import os
import glob

import numpy as np

from rel_pose_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from rel_pose_tpu.config import ModelConfig


def run_eval(batch, dtype):
    from rel_pose_tpu.models import vitess_init
    from rel_pose_tpu.models.vitess import vitess_forward
    cfg = ModelConfig(compute_dtype=dtype)
    params, state = vitess_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(
        0, 255, (batch, 2, 3, 256, 256), dtype=np.uint8))
    intr = jnp.asarray(np.tile(
        np.array([[128.0, 128.0, 128.0, 128.0]], np.float32),
        (batch, 2, 1)))

    @jax.jit
    def fwd(params, images):
        poses, _ = vitess_forward(params, state, cfg, images, intr,
                                  training=False)
        return poses

    return lambda: np.asarray(fwd(params, images))


def run_train(batch, dtype):
    from rel_pose_tpu.models import vitess_init
    from rel_pose_tpu.train.state import TrainState
    from rel_pose_tpu.train.step import make_train_step
    from rel_pose_tpu.train.optim import make_optimizer
    cfg = ModelConfig(compute_dtype=dtype)
    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer()
    step_fn = make_train_step(cfg, tx)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(
        0, 255, (batch, 2, 3, 384, 512), dtype=np.uint8))
    poses = np.zeros((batch, 2, 7), np.float32)
    poses[..., 6] = 1.0
    poses[:, 1, 0] = 0.3
    poses = jnp.asarray(poses)
    intr = jnp.asarray(np.tile(
        np.array([[517.97, 517.97, 320, 240]], np.float32), (batch, 2, 1)))
    holder = {"state": TrainState.create(params, bn_state, tx)}

    def once():
        holder["state"], metrics, _ = step_fn(
            holder["state"], images, poses, intr)
        return np.asarray(metrics["loss"])

    return once


def main():
    mode = os.environ.get("PROF_MODE", "eval")
    if mode == "eval":
        batch = int(os.environ.get("PROF_BATCH", "256"))
        dtype = os.environ.get("PROF_DTYPE", "bfloat16")
        fn = run_eval(batch, dtype)
    else:
        batch = int(os.environ.get("PROF_BATCH", "60"))
        dtype = os.environ.get("PROF_DTYPE", "float32")
        fn = run_train(batch, dtype)
    prof_dir = os.environ.get("PROF_DIR", f"/tmp/prof_{mode}_{dtype}")

    fn()  # compile + warm
    fn()
    jax.profiler.start_trace(prof_dir)
    for _ in range(int(os.environ.get("PROF_ITERS", "3"))):
        fn()
    jax.profiler.stop_trace()

    files = sorted(glob.glob(prof_dir + "/**/*.xplane.pb", recursive=True))
    if not files:
        print("NO TRACE FILES under", prof_dir)
        return
    data = jax.profiler.ProfileData.from_file(files[-1])
    for plane in data.planes:
        durs = {}
        nev = 0
        for line in plane.lines:
            for ev in line.events:
                nev += 1
                durs[ev.name] = durs.get(ev.name, 0.0) + ev.duration_ns
        total = sum(durs.values())
        print(f"\n== plane: {plane.name}  events={nev} "
              f"total={total/1e6:.2f} ms (over all traced iters)")
        for name, ns in sorted(durs.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {ns/1e6:9.3f} ms  {100*ns/max(total,1):5.1f}%  "
                  f"{name[:90]}")


if __name__ == "__main__":
    main()
