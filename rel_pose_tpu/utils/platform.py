"""Backend selection helper for the CLIs.

The sandboxed axon TPU plugin ignores late ``JAX_PLATFORMS`` env edits, so
CLIs honor ``RELPOSE_PLATFORM`` (e.g. ``cpu``, ``tpu``) via ``jax.config``
— set it to run any entry point on the host CPU (tests, smoke runs).
"""

import os


def apply_platform_env():
    plat = os.environ.get("RELPOSE_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
