"""Runtime gating for the Pallas kernels.

Every fused op consults :func:`use_pallas` to decide between its Mosaic
kernel and the unfused XLA reference path, and :func:`interpret_default`
to decide whether ``pallas_call`` should run in interpret mode.

Env knobs:

- ``RELPOSE_NO_PALLAS=1`` — force the unfused XLA path everywhere (the
  A/B lever used by the hardware grad check and the perf ablations).
- ``RELPOSE_PALLAS_INTERPRET=1`` — engage the fused kernels even off-TPU,
  running them through Pallas interpret mode.  This exercises the REAL
  fused forward/backward wiring (custom VJPs, stash plumbing, weight-grad
  accumulation) on CPU, which is how CI triangulates full-model gradients
  without hardware (``tests/test_grad_triangulation.py``).
"""

import os

import jax


def use_pallas():
    if os.environ.get("RELPOSE_NO_PALLAS"):
        return False
    if os.environ.get("RELPOSE_PALLAS_INTERPRET"):
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # no backend at all
        return False


def interpret_default(explicit):
    """Resolve a call-site ``interpret=`` argument against the env knob."""
    return bool(explicit) or bool(os.environ.get("RELPOSE_PALLAS_INTERPRET"))
