"""Profiling / throughput instrumentation (SURVEY.md §5.1).

The reference has no profiling beyond tqdm; here:
  * ``StepTimer`` — wall-clock step-time and pairs/sec/chip counters with
    warmup skip, the training loop's throughput observability;
  * ``trace`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-viewable device trace on demand (set
    ``RELPOSE_TRACE_DIR`` or pass a path).
"""

import contextlib
import os
import time


class StepTimer:
    """Tracks step time and throughput.

    Note: on asynchronous backends a step's device work may not have
    finished when ``tick`` is called; over many steps the pipeline reaches
    steady state and the average is accurate.
    """

    def __init__(self, pairs_per_step, num_chips=1, warmup=5):
        self.pairs_per_step = pairs_per_step
        self.num_chips = max(1, num_chips)
        self.warmup = warmup
        self.count = 0
        self._t0 = None
        self.total_time = 0.0
        self.timed_steps = 0

    def tick(self):
        now = time.perf_counter()
        self.count += 1
        if self.count <= self.warmup:
            self._t0 = now
            return None
        dt = now - self._t0
        self._t0 = now
        self.total_time += dt
        self.timed_steps += 1
        return dt

    @property
    def steps_per_sec(self):
        if self.timed_steps == 0 or self.total_time == 0:
            return 0.0
        return self.timed_steps / self.total_time

    @property
    def pairs_per_sec_per_chip(self):
        return self.steps_per_sec * self.pairs_per_step / self.num_chips

    def metrics(self):
        return {
            "steps_per_sec": self.steps_per_sec,
            "pairs_per_sec_per_chip": self.pairs_per_sec_per_chip,
        }


@contextlib.contextmanager
def trace(log_dir=None):
    """Capture a jax.profiler device trace if a directory is configured."""
    log_dir = log_dir or os.environ.get("RELPOSE_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
