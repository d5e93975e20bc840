"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native way to exercise multi-chip data parallelism without
hardware (the reference never had this — its only escape hatch was the
single-process ``--no_ddp`` flag, ``/root/reference/train.py:228``).

NOTE: the sandbox presets ``JAX_PLATFORMS=axon`` (a tunneled TPU) and the
axon plugin ignores later env-var edits, so we must force the CPU backend via
``jax.config`` — env vars alone do not stick.
"""

import os

# Must be set before jax initializes its backends.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
