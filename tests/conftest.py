"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native way to exercise multi-chip data parallelism without
hardware (the reference never had this — its only escape hatch was the
single-process ``--no_ddp`` flag, ``/root/reference/train.py:228``).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
