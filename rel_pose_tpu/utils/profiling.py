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

    def __init__(self, pairs_per_step, num_chips=1, warmup=5,
                 flops_per_step=None, peak_flops=None):
        self.pairs_per_step = pairs_per_step
        self.num_chips = max(1, num_chips)
        self.warmup = warmup
        self.flops_per_step = flops_per_step      # global (whole batch)
        self.peak_flops = peak_flops              # per chip
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

    @property
    def mfu(self):
        """Model FLOPs utilization: achieved matmul/conv FLOPs per chip over
        the chip's peak.  None unless both flops_per_step (global) and
        peak_flops (per chip) were provided."""
        if not self.flops_per_step or not self.peak_flops:
            return None
        per_chip = self.flops_per_step / self.num_chips
        return self.steps_per_sec * per_chip / self.peak_flops

    def metrics(self):
        out = {
            "steps_per_sec": self.steps_per_sec,
            "pairs_per_sec_per_chip": self.pairs_per_sec_per_chip,
        }
        if self.mfu is not None:
            out["mfu"] = self.mfu
        return out


# ------------------------------------------------------- model FLOPs (MFU) --

def jaxpr_matmul_flops(closed_jaxpr):
    """Total matmul/conv FLOPs of a traced computation (2 x MACs).

    Walks every ``dot_general`` and ``conv_general_dilated`` equation,
    recursing through call/control-flow sub-jaxprs.  Elementwise and
    reduction work is excluded by construction — this is the numerator
    convention of MFU (model FLOPs, not hardware ops).

    Count the UNFUSED path (``RELPOSE_NO_PALLAS=1``): the fused Pallas
    kernels compute identical math, so the unfused trace is the model's
    FLOP content without needing per-kernel cost plumbing.
    """
    from jax._src import core as jcore

    total = 0

    def dims_prod(shape, idxs):
        p = 1
        for i in idxs:
            p *= shape[i]
        return p

    def walk(jaxpr):
        nonlocal total
        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            if name == "dot_general":
                lhs = eqn.invars[0].aval.shape
                rhs = eqn.invars[1].aval.shape
                (lc, rc), (lb, _rb) = eqn.params["dimension_numbers"]
                k = dims_prod(lhs, lc)
                b = dims_prod(lhs, lb)
                m = dims_prod(lhs, [i for i in range(len(lhs))
                                    if i not in set(lc) | set(lb)])
                n = dims_prod(rhs, [i for i in range(len(rhs))
                                    if i not in set(rc) | set(_rb)])
                total += 2 * b * m * n * k
            elif name == "conv_general_dilated":
                out = eqn.outvars[0].aval.shape        # N, OC, spatial...
                rhs = eqn.invars[1].aval.shape         # OC, IC/g, kernel...
                k_elems = 1
                for d in rhs[1:]:
                    k_elems *= d          # IC/g * prod(kernel): per-output
                out_elems = 1             # MACs are already group-local
                for d in out:
                    out_elems *= d
                total += 2 * out_elems * k_elems
            for v in eqn.params.values():
                for sub in (v if isinstance(v, (tuple, list)) else (v,)):
                    if isinstance(sub, jcore.ClosedJaxpr):
                        walk(sub.jaxpr)
                    elif isinstance(sub, jcore.Jaxpr):
                        walk(sub)

    walk(closed_jaxpr.jaxpr)
    return total


def estimate_step_flops(fn, *args):
    """Matmul/conv FLOPs of one ``fn(*args)`` call, by abstract tracing on
    the UNFUSED path (no device, no compile).  Returns None if tracing
    fails (e.g. an arg set the tracer cannot abstract)."""
    import jax

    prev = os.environ.get("RELPOSE_NO_PALLAS")
    os.environ["RELPOSE_NO_PALLAS"] = "1"
    try:
        return jaxpr_matmul_flops(jax.make_jaxpr(fn)(*args))
    except Exception:
        if os.environ.get("RELPOSE_DEBUG_TRACE"):
            raise  # surface the trace error instead of a silent None
        return None
    finally:
        if prev is None:
            os.environ.pop("RELPOSE_NO_PALLAS", None)
        else:
            os.environ["RELPOSE_NO_PALLAS"] = prev


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
