"""Logger and profiling-utility tests."""

import json
import os
import time

import numpy as np

from rel_pose_tpu.train.logger import Logger
from rel_pose_tpu.utils.profiling import StepTimer


class TestLogger:
    def test_running_means_and_jsonl(self, tmp_path, capsys):
        out = str(tmp_path)
        sched = lambda step: 1e-3  # noqa: E731
        logger = Logger("exp", sched, output_dir=out, sum_freq=5)
        for i in range(10):
            logger.push({"train_geo_loss_tr": float(i),
                         "train_geo_loss_rot": 2.0})
        logger.close()
        captured = capsys.readouterr().out
        # two flushes, each printing [step, lr]
        assert captured.count("0.0010000") == 2
        jsonl = os.path.join(out, "exp", "runs", "metrics.jsonl")
        lines = [json.loads(l) for l in open(jsonl)]
        assert len(lines) == 2
        # first flush: mean of 0..4 = 2.0
        np.testing.assert_allclose(lines[0]["train_geo_loss_tr"], 2.0)
        np.testing.assert_allclose(lines[1]["train_geo_loss_tr"], 7.0)
        np.testing.assert_allclose(lines[0]["train_geo_loss_rot"], 2.0)

    def test_write_dict(self, tmp_path):
        logger = Logger("exp", None, output_dir=str(tmp_path))
        logger.write_dict({"val_metric": 1.5}, step=7)
        logger.close()
        jsonl = os.path.join(str(tmp_path), "exp", "runs", "metrics.jsonl")
        rec = json.loads(open(jsonl).read().strip())
        assert rec == {"step": 7, "val_metric": 1.5}


class TestStepTimer:
    def test_throughput_math(self):
        t = StepTimer(pairs_per_step=32, num_chips=4, warmup=1)
        t.tick()  # warmup
        for _ in range(5):
            time.sleep(0.01)
            t.tick()
        assert t.timed_steps == 5
        sps = t.steps_per_sec
        assert 10 < sps < 110  # ~100/s nominal, generous bounds
        np.testing.assert_allclose(t.pairs_per_sec_per_chip, sps * 8,
                                   rtol=1e-6)
        m = t.metrics()
        assert set(m) == {"steps_per_sec", "pairs_per_sec_per_chip"}


class TestModelFlops:
    def test_jaxpr_matmul_flops_exact(self):
        import jax
        import jax.numpy as jnp
        from rel_pose_tpu.utils.profiling import jaxpr_matmul_flops

        def f(x, w):
            return jnp.dot(x, w)

        x = jax.ShapeDtypeStruct((8, 16), jnp.float32)
        w = jax.ShapeDtypeStruct((16, 32), jnp.float32)
        assert jaxpr_matmul_flops(jax.make_jaxpr(f)(x, w)) == 2 * 8 * 16 * 32

    def test_jaxpr_conv_flops_exact(self):
        import jax
        import jax.numpy as jnp
        from rel_pose_tpu.utils.profiling import jaxpr_matmul_flops

        def f(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        x = jax.ShapeDtypeStruct((2, 3, 8, 8), jnp.float32)
        k = jax.ShapeDtypeStruct((5, 3, 3, 3), jnp.float32)
        # 2 * (N*OC*OH*OW) * (IC*KH*KW)
        want = 2 * (2 * 5 * 8 * 8) * (3 * 3 * 3)
        assert jaxpr_matmul_flops(jax.make_jaxpr(f)(x, k)) == want

    def test_grad_counts_more_than_forward(self):
        """The fwd+bwd trace must carry ~3x the forward's matmul FLOPs."""
        import jax
        import jax.numpy as jnp
        from rel_pose_tpu.utils.profiling import estimate_step_flops

        w = jax.ShapeDtypeStruct((64, 64), jnp.float32)
        x = jax.ShapeDtypeStruct((32, 64), jnp.float32)

        def loss(w_, x_):
            return jnp.sum(jnp.dot(x_, w_) ** 2)

        fwd = estimate_step_flops(loss, w, x)
        both = estimate_step_flops(
            lambda w_, x_: jax.value_and_grad(loss, argnums=(0, 1))(w_, x_),
            w, x)
        assert fwd == 2 * 32 * 64 * 64
        assert both == 3 * fwd  # fwd + dw + dx

    def test_steptimer_mfu(self):
        t = StepTimer(pairs_per_step=8, num_chips=2, warmup=0,
                      flops_per_step=4e12, peak_flops=1e12)
        t._t0 = 0.0
        t.count = 1
        t.total_time = 1.0
        t.timed_steps = 1
        # 1 step/s * (4e12/2 chips) / 1e12 peak = 2.0
        np.testing.assert_allclose(t.mfu, 2.0)
        assert "mfu" in t.metrics()
