#!/usr/bin/env python
"""Train-step throughput on the real TPU: full forward + backward + Adam.

Chains BENCH_ITERS real optimizer steps inside one device program (the state
carry makes every iteration data-dependent — no artificial coupling needed)
and reports ms/step + pairs/s for the requested dtype and batch.

Env: BENCH_BATCH (default 60 = the reference's 10 GPUs x 6 global batch),
BENCH_ITERS (default 20), BENCH_DTYPE (float32|bfloat16), BENCH_REMAT=1.
"""

import json
import os
import time

import numpy as np

from rel_pose_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from rel_pose_tpu.config import ModelConfig
from rel_pose_tpu.models import vitess_init
from rel_pose_tpu.train import TrainState, make_optimizer
from rel_pose_tpu.train.step import make_loss_fn


def main():
    batch = int(os.environ.get("BENCH_BATCH", "60"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    remat = bool(os.environ.get("BENCH_REMAT"))

    cfg = ModelConfig(compute_dtype=dtype)
    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer()
    state = TrainState.create(params, bn_state, tx)
    loss_fn = make_loss_fn(cfg, 10.0, 10.0, "train", remat=remat)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (batch, 2, 3, 384, 512)).astype(np.float32))
    poses = np.zeros((batch, 2, 7), np.float32)
    poses[..., 6] = 1.0
    poses[:, 1, 0] = 0.3
    poses = jnp.asarray(poses)
    intr = jnp.asarray(np.tile(
        np.array([[517.97, 517.97, 320, 240]], np.float32), (batch, 2, 1)))

    mode = os.environ.get("BENCH_MODE", "step")  # step | grad | fwd

    @jax.jit
    def loop(state, images, poses, intr):
        def body(_, st):
            if mode == "fwd":
                loss, (new_bn, _, _) = loss_fn(
                    st.params, st.bn_state, images, poses, intr, True)
                # fold the loss into the FIRST conv's weights so every op
                # in the next iteration is data-dependent (pos_embed alone
                # lets XLA hoist the whole conv trunk out of the loop)
                p = jax.tree.map(lambda x: x, st.params)
                p["resnet"] = dict(p["resnet"])
                p["resnet"]["conv1"] = {
                    "w": p["resnet"]["conv1"]["w"] + 1e-30 * loss}
                return st.replace(params=p, bn_state=new_bn,
                                  step=st.step + 1)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (new_bn, _, _)), grads = grad_fn(
                st.params, st.bn_state, images, poses, intr, True)
            if mode == "grad":
                # consume EVERY grad leaf so XLA cannot dead-code the
                # backward (folding only the loss in leaves the whole
                # grad computation unused -> eliminated)
                gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
                p = jax.tree.map(lambda x: x, st.params)
                p["resnet"] = dict(p["resnet"])
                p["resnet"]["conv1"] = {
                    "w": p["resnet"]["conv1"]["w"] + 1e-30 * (loss + gsum)}
                return st.replace(params=p, bn_state=new_bn,
                                  step=st.step + 1)
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

    ms = dt / iters * 1000
    print(json.dumps({
        "metric": "train_" + mode + "_ms",
        "value": round(ms, 2),
        "unit": "ms",
        "dtype": dtype,
        "batch": batch,
        "remat": remat,
        "pairs_per_sec": round(batch * iters / dt, 2),
    }))


if __name__ == "__main__":
    main()
