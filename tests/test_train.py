"""Training runtime tests: optimizer parity vs torch, and the full
data-parallel train step on the virtual 8-device CPU mesh."""

import os
import numpy as np
import torch
import jax
import jax.numpy as jnp

from rel_pose_tpu.config import ModelConfig
from rel_pose_tpu.models import vitess_init
from rel_pose_tpu.parallel import make_mesh, shard_batch, replicate
from rel_pose_tpu.train import (
    TrainState, make_optimizer, onecycle_schedule, make_train_step,
    make_eval_step,
)

RNG = np.random.default_rng(5)


class TestSchedule:
    def test_onecycle_vs_torch(self):
        lr, steps, warmup = 5e-4, 1000, 100
        sched = onecycle_schedule(lr, steps, warmup)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=lr)
        tsched = torch.optim.lr_scheduler.OneCycleLR(
            opt, lr, steps, pct_start=warmup / steps, div_factor=25,
            cycle_momentum=False)
        torch_lrs = []
        for _ in range(steps):
            torch_lrs.append(tsched.get_last_lr()[0])
            opt.step()
            tsched.step()
        ours = np.array([float(sched(i)) for i in range(steps)])
        ref = np.array(torch_lrs)
        # torch-exact (same phase boundary pct*total-1, cosine both phases):
        # pointwise-RELATIVE to fp32 trig rounding (torch computes the same
        # curve in float64; worst tail-lr drift measured 2.8e-5)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)
        # structural invariants
        np.testing.assert_allclose(ours[0], lr / 25, rtol=1e-4)
        assert int(np.argmax(ours)) == warmup - 1
        np.testing.assert_allclose(ours.max(), lr, rtol=1e-5)
        assert ours[-1] < lr / 25 / 1e3

    def test_adam_matches_torch(self):
        """One optimizer step on a toy linear layer must match torch Adam
        with weight_decay + grad clip exactly."""
        w0 = RNG.standard_normal((4, 3)).astype(np.float32)
        g = (RNG.standard_normal((4, 3)) * 5).astype(np.float32)  # clips

        # torch side
        wt = torch.nn.Parameter(torch.tensor(w0.copy()))
        opt = torch.optim.Adam([wt], lr=1e-3, weight_decay=1e-5)
        wt.grad = torch.tensor(g.copy())
        torch.nn.utils.clip_grad_norm_([wt], 2.5)
        opt.step()

        # ours: constant-lr variant of the same chain
        import optax
        tx = optax.chain(
            optax.clip_by_global_norm(2.5),
            optax.add_decayed_weights(1e-5),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(1e-3),
        )
        params = {"w": jnp.array(w0)}
        opt_state = tx.init(params)
        updates, _ = tx.update({"w": jnp.array(g)}, opt_state, params)
        new_w = np.asarray(params["w"] + updates["w"])
        np.testing.assert_allclose(new_w, wt.detach().numpy(), atol=1e-6)


def small_cfg():
    return ModelConfig(transformer_depth=2)


def fake_train_batch(B):
    images = RNG.uniform(0, 255, (B, 2, 3, 96, 128)).astype(np.float32)
    poses = np.zeros((B, 2, 7), dtype=np.float32)
    poses[..., 6] = 1.0
    poses[:, 1, 0] = 0.3
    intr = np.tile(np.array([[517.97, 517.97, 320, 240]], dtype=np.float32),
                   (B, 2, 1))
    return images, poses, intr


class TestTrainStep:
    def test_single_device_step_descends(self):
        cfg = small_cfg()
        params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
        tx, sched = make_optimizer(lr=1e-3, steps=100, warmup=10)
        state = TrainState.create(params, bn_state, tx)
        step_fn = make_train_step(cfg, tx)
        images, poses, intr = fake_train_batch(2)
        losses = []
        for _ in range(3):
            state, metrics, poses_est = step_fn(
                state, jnp.array(images), jnp.array(poses), jnp.array(intr))
            losses.append(float(metrics["loss"]))
        assert int(state.step) == 3
        assert all(np.isfinite(losses))
        assert poses_est.shape == (2, 2, 7)

    def test_eight_device_mesh_step(self):
        """The multi-chip DP path: state replicated, batch sharded over 8
        virtual devices, gradient all-reduce emitted by XLA."""
        mesh = make_mesh()
        assert mesh.size == 8
        cfg = small_cfg()
        params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
        tx, _ = make_optimizer(lr=1e-3, steps=100, warmup=10)
        state = TrainState.create(params, bn_state, tx)
        state = replicate(mesh, state)
        step_fn = make_train_step(cfg, tx, mesh=mesh)
        images, poses, intr = fake_train_batch(8)
        batch = shard_batch(mesh, (jnp.array(images), jnp.array(poses),
                                   jnp.array(intr)))
        state, metrics, _ = step_fn(state, *batch)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1

        # sharded step must agree with a single-device step on the same batch
        params2, bn2 = vitess_init(jax.random.PRNGKey(0), cfg)
        state2 = TrainState.create(params2, bn2, tx)
        step_single = make_train_step(cfg, tx)
        state2, metrics2, _ = step_single(
            state2, jnp.array(images), jnp.array(poses), jnp.array(intr))
        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(metrics2["loss"]), rtol=1e-4)
        w_a = np.asarray(state.params["pose_regressor"]["fc3"]["w"])
        w_b = np.asarray(state2.params["pose_regressor"]["fc3"]["w"])
        np.testing.assert_allclose(w_a, w_b, atol=1e-4)

    def test_remat_step_matches(self):
        """jax.checkpoint remat must not change the update."""
        cfg = small_cfg()
        params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
        tx, _ = make_optimizer(lr=1e-3, steps=100, warmup=10)
        images, poses, intr = fake_train_batch(2)
        args = (jnp.array(images), jnp.array(poses), jnp.array(intr))

        s1 = TrainState.create(params, bn_state, tx)
        s1, m1, _ = make_train_step(cfg, tx)(s1, *args)
        s2 = TrainState.create(*vitess_init(jax.random.PRNGKey(0), cfg), tx)
        s2, m2, _ = make_train_step(cfg, tx, remat=True)(s2, *args)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s1.params["pose_regressor"]["fc3"]["w"]),
            np.asarray(s2.params["pose_regressor"]["fc3"]["w"]), atol=1e-6)

    def test_eval_step(self):
        cfg = small_cfg()
        params, bn_state = vitess_init(jax.random.PRNGKey(0), cfg)
        tx, _ = make_optimizer()
        state = TrainState.create(params, bn_state, tx)
        eval_fn = make_eval_step(cfg)
        images, poses, intr = fake_train_batch(2)
        metrics, poses_est = eval_fn(state, jnp.array(images),
                                     jnp.array(poses), jnp.array(intr))
        assert "val_geo_loss_tr" in metrics
        assert np.isfinite(float(metrics["loss"]))


def test_allgather_ragged_single_process():
    """Single-process degenerate case of the pod-eval gather: output ==
    input rows (float32), names preserved."""
    from rel_pose_tpu.parallel import allgather_ragged
    rows = [np.array([1.0, 2.0, 3.0]), np.array([4.0, 5.0, 6.0])]
    quats = [np.array([0.0, 0.0, 0.0, 1.0])]
    # ragged ACROSS names is rejected
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        allgather_ragged({"t": (rows, 3), "r": (quats, 4)})
    out = allgather_ragged({"t": (rows, 3), "r": (rows[:2], 3)})
    np.testing.assert_allclose(out["t"], np.stack(rows))
    assert out["t"].dtype == np.float32
    empty = allgather_ragged({"t": ([], 3)})
    assert empty["t"].shape == (0, 3)


class TestAsyncCheckpointer:
    def test_roundtrip_and_overlap(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from rel_pose_tpu.train.checkpoint import (AsyncCheckpointer,
                                                   load_checkpoint)
        tree = {"a": jnp.arange(8, dtype=jnp.float32),
                "b": {"c": jnp.ones((3, 3))}}
        w = AsyncCheckpointer()
        p1 = str(tmp_path / "000001.ckpt")
        p2 = str(tmp_path / "000002.ckpt")
        w.save(p1, tree)
        # second save waits for the first, so both land complete
        w.save(p2, jax.tree.map(lambda x: x * 2, tree))
        w.close()
        back1 = load_checkpoint(p1, jax.tree.map(np.asarray, tree))
        back2 = load_checkpoint(p2, jax.tree.map(np.asarray, tree))
        np.testing.assert_array_equal(back1["a"],
                                      np.arange(8, dtype=np.float32))
        np.testing.assert_array_equal(back2["b"]["c"], 2 * np.ones((3, 3)))
        # no stray .tmp files (writes are atomic renames)
        assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]

    def test_write_error_surfaces(self, tmp_path):
        from rel_pose_tpu.train.checkpoint import AsyncCheckpointer
        import pytest as _pytest
        w = AsyncCheckpointer()
        w.save(str(tmp_path / "no_such_dir" / "x.ckpt"), {"a": np.ones(2)})
        with _pytest.raises(OSError):
            w.wait()
        w.close()
