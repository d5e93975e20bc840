"""Worker process for the 2-process CPU multi-host smoke test.

Launched by ``tests/test_multihost.py`` as
``python tests/multihost_worker.py <port> <process_id> <num_processes>``.
Each process owns 2 virtual CPU devices; together they form a 4-device
``('data',)`` mesh.  Runs ONE data-parallel train step with the SAME
global batch the single-process reference would see and prints the loss —
the test asserts both processes print identical, finite values.

This is the closest CPU-only analogue of a 2-host TPU pod: it exercises
``jax.distributed.initialize`` with explicit coordinator args, the
process-local-data path of ``parallel.mesh.shard_batch``/``replicate``,
and XLA's cross-process gradient all-reduce (the reference's NCCL DDP,
``/root/reference/train.py:28-36``).
"""

import os
import sys


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    # optional 4th arg: "fused" runs the Pallas kernels (interpret mode on
    # CPU) under the multi-process mesh at a reduced geometry; "unfused"
    # is the same geometry on the stock XLA path (the comparison target);
    # default is the original full-geometry DDP smoke.
    mode = sys.argv[4] if len(sys.argv) > 4 else "ddp"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    os.environ.pop("JAX_PLATFORMS", None)
    if mode == "fused":
        # engages every fused kernel through pl.pallas_call(interpret=True)
        # while shard_map partitions them over the 2-process global mesh —
        # the exact composition a real multi-chip pod runs (minus Mosaic)
        os.environ["RELPOSE_PALLAS_INTERPRET"] = "1"
    elif mode == "unfused":
        os.environ["RELPOSE_NO_PALLAS"] = "1"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 2 * nproc

    import numpy as np
    import jax.numpy as jnp
    from rel_pose_tpu.config import ModelConfig
    from rel_pose_tpu.models import vitess_init
    from rel_pose_tpu.parallel import make_mesh, shard_batch, replicate
    from rel_pose_tpu.train import TrainState, make_optimizer, make_train_step

    if mode == "ddp":
        cfg = ModelConfig(transformer_depth=2)
    else:
        # reduced geometry (interpret-mode kernels are CPU-traced JAX;
        # production 24x24 costs ~10 min/step) — same config as
        # tests/test_grad_triangulation.py
        cfg = ModelConfig(compute_dtype="float32", transformer_depth=2,
                          feature_height=8, feature_width=8, pool_size=8,
                          fc_hidden_size=64)
    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(lr=1e-3, steps=100, warmup=10)
    state = TrainState.create(params, bn_state, tx)

    mesh = make_mesh()
    assert mesh.size == 2 * nproc
    state = replicate(mesh, state)
    step_fn = make_train_step(cfg, tx, mesh=mesh)

    # deterministic GLOBAL batch of 4; this process contributes its
    # contiguous 2-sample shard (mirrors data/loader.py's per-host
    # sharding: shard_index = jax.process_index())
    rng = np.random.default_rng(5)
    B = 2 * nproc
    images = rng.uniform(0, 255, (B, 2, 3, 96, 128)).astype(np.float32)
    poses = np.zeros((B, 2, 7), dtype=np.float32)
    poses[..., 6] = 1.0
    poses[:, 1, 0] = 0.3
    intr = np.tile(np.array([[517.97, 517.97, 320, 240]], np.float32),
                   (B, 2, 1))
    lo, hi = pid * 2, (pid + 1) * 2
    batch = shard_batch(mesh, (jnp.asarray(images[lo:hi]),
                               jnp.asarray(poses[lo:hi]),
                               jnp.asarray(intr[lo:hi])))

    state, metrics, _ = step_fn(state, *batch)
    loss = float(jax.device_get(metrics["loss"]))
    step = int(jax.device_get(state.step))
    print(f"MULTIHOST_OK pid={pid} step={step} loss={loss:.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
