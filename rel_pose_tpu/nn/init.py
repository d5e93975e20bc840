"""Weight initializers (pure JAX).

Functional equivalents of the timm-derived initializers the reference uses
(``/root/reference/src/modules/vit_layers/weight_init.py``): truncated normal
via inverse-CDF sampling, variance scaling, and the xavier/lecun wrappers.
Shapes use jax conventions: linear weights are ``(in, out)``, conv weights
OIHW.
"""

import math

import jax
import jax.numpy as jnp


def trunc_normal(key, shape, mean=0.0, std=1.0, a=-2.0, b=2.0,
                 dtype=jnp.float32):
    """Truncated normal via uniform -> erfinv inverse-CDF transform
    (same method as ``weight_init.py:8-41``)."""
    def norm_cdf(x):
        return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0

    lo = norm_cdf((a - mean) / std)
    hi = norm_cdf((b - mean) / std)
    u = jax.random.uniform(key, shape, dtype=dtype,
                           minval=2 * lo - 1, maxval=2 * hi - 1)
    x = jax.scipy.special.erfinv(u)
    x = x * (std * math.sqrt(2.0)) + mean
    return jnp.clip(x, a, b)


def _fan_in_fan_out(shape):
    """Fan computation for linear ``(in, out)`` and conv ``(O, I, H, W)``."""
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    return shape[1] * receptive, shape[0] * receptive


def variance_scaling(key, shape, scale=1.0, mode="fan_in",
                     distribution="normal", dtype=jnp.float32):
    fan_in, fan_out = _fan_in_fan_out(shape)
    denom = {"fan_in": fan_in, "fan_out": fan_out,
             "fan_avg": (fan_in + fan_out) / 2}[mode]
    variance = scale / denom
    if distribution == "truncated_normal":
        # 0.87962... = stddev of a standard normal truncated to (-2, 2)
        return trunc_normal(key, shape,
                            std=math.sqrt(variance) / 0.87962566103423978,
                            dtype=dtype)
    if distribution == "normal":
        return jax.random.normal(key, shape, dtype) * math.sqrt(variance)
    if distribution == "uniform":
        bound = math.sqrt(3 * variance)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    raise ValueError(f"invalid distribution {distribution}")


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = _fan_in_fan_out(shape)
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def lecun_normal(key, shape, dtype=jnp.float32):
    return variance_scaling(key, shape, mode="fan_in",
                            distribution="truncated_normal", dtype=dtype)


def kaiming_uniform_torch(key, shape, a=math.sqrt(5.0), dtype=jnp.float32):
    """PyTorch's default Linear/Conv weight init (kaiming uniform, a=sqrt(5)),
    used so fresh models match the reference's default-initialized layers."""
    fan_in, _ = _fan_in_fan_out(shape)
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_uniform(key, shape, fan_in, dtype=jnp.float32):
    """PyTorch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)
