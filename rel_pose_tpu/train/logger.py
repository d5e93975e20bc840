"""Training logger: running means, console, CSV, optional TensorBoard.

Equivalent of the reference ``Logger`` (``/root/reference/src/logger.py``):
accumulates metrics and every SUM_FREQ=100 steps prints
``[step, lr] metric values`` and writes scalars.  TensorBoard is used when
available; a JSONL file under ``output/<name>/runs`` is always written so
observability never silently disappears.
"""

import json
import os
import time

SUM_FREQ = 100


class Logger:
    def __init__(self, name, schedule=None, output_dir="output",
                 sum_freq=SUM_FREQ):
        self.name = name
        self.schedule = schedule
        self.sum_freq = sum_freq
        self.total_steps = 0
        self.running = {}
        self._writer = None
        self._jsonl = None
        self.run_dir = os.path.join(output_dir, name, "runs")
        self._t0 = time.time()
        self._last_flush_step = 0

    def _ensure_sinks(self):
        os.makedirs(self.run_dir, exist_ok=True)
        if self._jsonl is None:
            self._jsonl = open(os.path.join(self.run_dir, "metrics.jsonl"),
                               "a")
        if self._writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._writer = SummaryWriter(self.run_dir)
            except Exception:
                self._writer = False

    def _flush(self, count=None):
        self._ensure_sinks()
        lr = float(self.schedule(self.total_steps)) if self.schedule else 0.0
        count = count or self.sum_freq
        means = {k: v / count for k, v in self.running.items()}
        steps_done = self.total_steps + 1 - self._last_flush_step
        dt = time.time() - self._t0
        rate = steps_done / dt if dt > 0 else 0.0
        metrics_str = ", ".join(f"{v:10.4f}" for v in means.values())
        print(f"[{self.total_steps + 1:6d}, {lr:10.7f}] {metrics_str} "
              f"({rate:.2f} it/s)")
        record = {"step": self.total_steps, "lr": lr,
                  "steps_per_sec": rate, **means}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._writer:
            for k, v in means.items():
                self._writer.add_scalar(k, v, self.total_steps)
        self.running = {}
        self._t0 = time.time()
        self._last_flush_step = self.total_steps + 1

    def push(self, metrics):
        for k, v in metrics.items():
            self.running[k] = self.running.get(k, 0.0) + float(v)
        if self.total_steps % self.sum_freq == self.sum_freq - 1:
            self._flush()
        self.total_steps += 1

    def write_dict(self, results, step=None):
        self._ensure_sinks()
        step = self.total_steps if step is None else step
        self._jsonl.write(json.dumps({"step": step, **{
            k: float(v) for k, v in results.items()}}) + "\n")
        self._jsonl.flush()
        if self._writer:
            for k, v in results.items():
                self._writer.add_scalar(k, float(v), step)

    def close(self):
        # flush any partial window so short runs still leave metrics behind
        pending = self.total_steps - self._last_flush_step
        if self.running and pending > 0:
            self._flush(count=pending)
        if self._jsonl:
            self._jsonl.close()
        if self._writer:
            self._writer.close()
