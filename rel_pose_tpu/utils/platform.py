"""Backend selection helper for the CLIs.

The sandboxed axon TPU plugin ignores late ``JAX_PLATFORMS`` env edits, so
CLIs honor ``RELPOSE_PLATFORM`` (e.g. ``cpu``, ``tpu``) via ``jax.config``
— set it to run any entry point on the host CPU (tests, smoke runs).
"""

import os

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir=None):
    """Persistent XLA compilation cache — first TPU compiles through the
    tunnel take minutes; cached reloads take seconds.  Disable with
    RELPOSE_NO_CACHE=1."""
    if os.environ.get("RELPOSE_NO_CACHE"):
        return
    import jax
    cache_dir = cache_dir or os.environ.get("RELPOSE_CACHE_DIR", _CACHE_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def apply_platform_env():
    plat = os.environ.get("RELPOSE_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    prec = os.environ.get("RELPOSE_MATMUL_PRECISION")
    if prec:
        # 'default' | 'high' (bf16x3) | 'highest' (bf16x6/near-fp32):
        # accuracy/speed of fp32-operand matmuls+convs on TPU (the model's
        # XLA path passes precision=None, deferring to this config).
        import jax
        jax.config.update("jax_default_matmul_precision", prec)
    enable_compilation_cache()
