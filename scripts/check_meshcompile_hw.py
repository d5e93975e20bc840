#!/usr/bin/env python
"""Single-chip proof that the fused Pallas kernels compose with shard_map.

VERDICT r3 missing #2(b): on the one real TPU chip, jit the FULL production
train step over a 1-device ``Mesh(('data',))`` — the same code path a
multi-chip slice takes (``ops.runtime.data_parallel_scope`` wraps every
fused op in ``jax.shard_map``) — and assert:

  * Mosaic lowering composes with the shard_map partitioning (compilation
    succeeds with the real kernels, not interpret mode);
  * the compiled HLO contains NO all-gather (the failure mode GSPMD's
    opaque-custom-call handling risks is gathering the (G, N, C) tokens);
  * one step executes with a finite loss.

The multi-device counterpart (sharded == single-device outputs/grads, no
all-gather at mesh size 8) runs in CI on the virtual CPU mesh:
``tests/test_shard_map_pallas.py``.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/check_meshcompile_hw.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rel_pose_tpu.utils.platform import enable_compilation_cache, \
    apply_platform_env

apply_platform_env()
enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp


def main():
    dtype = os.environ.get("CHECK_DTYPE", "bfloat16")
    B = int(os.environ.get("CHECK_BATCH", "8"))
    from rel_pose_tpu.config import ModelConfig
    from rel_pose_tpu.models import vitess_init
    from rel_pose_tpu.parallel import make_mesh, shard_batch, replicate
    from rel_pose_tpu.train import TrainState, make_optimizer, make_train_step

    print(f"devices: {jax.devices()}")
    cfg = ModelConfig(compute_dtype=dtype)
    mesh = make_mesh()
    print(f"mesh: {mesh}")

    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer()
    state = replicate(mesh, TrainState.create(params, bn_state, tx))
    step_fn = make_train_step(cfg, tx, mesh=mesh)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (B, 2, 3, 384, 512), dtype=np.uint8))
    poses = np.zeros((B, 2, 7), np.float32)
    poses[..., 6] = 1.0
    poses[:, 1, 0] = 0.3
    intr = np.tile(np.array([[517.97, 517.97, 320, 240]], np.float32),
                   (B, 2, 1))
    batch = shard_batch(mesh, (images, jnp.asarray(poses), jnp.asarray(intr)))

    lowered = step_fn.lower(state, *batch)
    compiled = lowered.compile()
    txt = compiled.as_text()
    gathers = [ln for ln in txt.splitlines()
               if re.search(r"\ball-gather(-start)?\(", ln)]
    n_custom = txt.count("custom-call")
    print(f"compiled: {len(txt.splitlines())} HLO lines, "
          f"{n_custom} custom-calls, {len(gathers)} all-gathers")
    if gathers:
        print("ALL-GATHER LINES:")
        for ln in gathers[:10]:
            print(" ", ln.strip()[:200])
        raise SystemExit("FAIL: all-gather present in sharded train step")

    state, metrics, _ = step_fn(state, *batch)
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss), loss
    print(f"PASS: mesh({mesh.size})-sharded fused train step compiled "
          f"(no all-gather) and executed, loss={loss:.4f} dtype={dtype}")


if __name__ == "__main__":
    main()
