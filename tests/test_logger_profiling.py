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
