"""GELU for Pallas kernels, matching the layer policy per dtype.

Mosaic has no erf/erfc lowering, so the exact (erf) GELU that torch and the
fp32 layer policy use is implemented with the Abramowitz & Stegun 7.1.26
polynomial (|error| < 1.5e-7 — far below the fp32 activation tolerances the
parity tests use).  bf16 inputs take the tanh form, identical to
``nn.layers.gelu``'s bf16 policy.
"""

import math

import jax
import jax.numpy as jnp

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)
_GELU_C = 0.044715
_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)
_LOG2E = 1.4426950408889634

# A&S 7.1.26 coefficients
_A1, _A2, _A3, _A4, _A5 = (0.254829592, -0.284496736, 1.421413741,
                           -1.453152027, 1.061405429)
_P = 0.3275911


def _erf_poly(x):
    """erf(x) to ~1.5e-7 absolute, fp32, via A&S 7.1.26 (uses only exp)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + _P * ax)
    poly = t * (_A1 + t * (_A2 + t * (_A3 + t * (_A4 + t * _A5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def kernel_gelu(x, tanh_form):
    """GELU matching ``nn.layers.gelu``'s policy: ``tanh_form`` for the bf16
    compute mode, exact erf form (polynomial) for fp32.

    The tanh form is computed as ``x * sigmoid(2u)`` (algebraically
    identical: tanh(u) = 2*sigmoid(2u) - 1), because sigmoid needs only ONE
    exp2 + reciprocal on the VPU, while Mosaic lowers ``tanh`` to a much
    longer rational approximation.  In-situ ablation put GELU at 1.57 ms of
    the 44.4 ms eval step — the largest single VPU item in the ViT kernel.
    fp32 differences vs the tanh intrinsic are last-ulp; outputs round to
    the same bf16 values the parity tests pin."""
    xf = x.astype(jnp.float32)
    if tanh_form:
        u = _SQRT_2_OVER_PI * (xf + _GELU_C * xf * xf * xf)
        s = 1.0 / (1.0 + jnp.exp2((-2.0 * _LOG2E) * u))
        return (xf * s).astype(x.dtype)
    return (0.5 * xf * (1.0 + _erf_poly(xf * _INV_SQRT2))).astype(x.dtype)


def kernel_gelu_grad(x, tanh_form):
    """d gelu / dx under the same policy; input is the fp32 pre-activation."""
    xf = x.astype(jnp.float32)
    if tanh_form:
        # same sigmoid rewrite as the forward: with s = sigmoid(2u),
        # 0.5*(1+tanh u) = s and 0.5*(1 - tanh^2 u) = 2*s*(1-s)
        u = _SQRT_2_OVER_PI * (xf + _GELU_C * xf * xf * xf)
        s = 1.0 / (1.0 + jnp.exp2((-2.0 * _LOG2E) * u))
        du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * xf * xf)
        return s + xf * (2.0 * s * (1.0 - s)) * du
    # exact: Phi(x) + x * phi(x)
    phi = _INV_SQRT_2PI * jnp.exp(-0.5 * xf * xf)
    Phi = 0.5 * (1.0 + _erf_poly(xf * _INV_SQRT2))
    return Phi + xf * phi
