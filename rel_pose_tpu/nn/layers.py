"""Functional NN primitives (pure JAX, pytree params).

Conventions (chosen for transparent PyTorch-checkpoint conversion and clean
pjit sharding):
  * params/state are nested dicts of jnp arrays;
  * linear weights are stored ``(in, out)`` (checkpoint converter transposes
    torch's ``(out, in)``);
  * conv weights are stored OIHW exactly like torch; activations are NCHW;
  * BatchNorm running statistics live in a separate "state" pytree so the
    param pytree stays a pure gradient target.

These replace the reference's torch.nn layers (Linear/LayerNorm/BatchNorm2d/
Conv2d/Mlp — ``/root/reference/src/modules/vit_layers/mlp.py``,
``extractor.py``) with jit/pjit-friendly equivalents.  Numerical semantics
(eps, momentum, GELU flavor) match PyTorch defaults so converted checkpoints
reproduce reference activations.
"""

import jax
import jax.numpy as jnp

from .init import kaiming_uniform_torch, torch_bias_uniform

# Hot-path matmul/conv precision: None defers to jax's
# ``jax_default_matmul_precision`` config, settable via the
# RELPOSE_MATMUL_PRECISION env (see utils.platform).  On TPU, fp32 operands
# at the backend default run single-pass-bf16-class MXU passes (~TF32
# accuracy, what torch-on-Ampere fp32 gives); strict-parity runs can set
# RELPOSE_MATMUL_PRECISION=highest for near-exact fp32 at ~3-6x matmul
# cost.  bf16 inputs are unaffected.
_DEFAULT = None


# ---------------------------------------------------------------- linear ----

def linear_init(key, in_features, out_features, bias=True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    params = {"w": kaiming_uniform_torch(kw, (in_features, out_features),
                                         dtype=dtype)}
    if bias:
        params["b"] = torch_bias_uniform(kb, (out_features,), in_features,
                                         dtype=dtype)
    return params


def linear_apply(params, x):
    y = jnp.matmul(x, params["w"].astype(x.dtype), precision=_DEFAULT)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


# ------------------------------------------------------------- layernorm ----

def layernorm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm_apply(params, x, eps=1e-6):
    """LayerNorm over the last axis.  eps defaults to 1e-6, matching the ViT
    norm_layer partial (``/root/reference/src/modules/vision_transformer.py:396``).
    Statistics are computed in fp32 for bf16 inputs."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(x.dtype)


# ------------------------------------------------------------- batchnorm ----

def batchnorm_init(num_features, dtype=jnp.float32):
    params = {"scale": jnp.ones((num_features,), dtype),
              "bias": jnp.zeros((num_features,), dtype)}
    state = {"mean": jnp.zeros((num_features,), dtype),
             "var": jnp.ones((num_features,), dtype),
             "count": jnp.zeros((), jnp.int32)}
    return params, state


def batchnorm_apply(params, state, x, training, momentum=0.1, eps=1e-5):
    """BatchNorm2d over NCHW.  Matches torch semantics: train mode normalizes
    with (biased) batch statistics and updates running stats with the
    *unbiased* variance; eval mode normalizes with running stats.

    Under pjit data parallelism the batch statistics are computed over the
    global batch (XLA inserts the cross-chip reduction) — a strict superset of
    DDP's per-GPU statistics.

    Returns (y, new_state).
    """
    if training:
        xf = x.astype(jnp.float32)
        axes = (0, 2, 3)
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
        n = x.shape[0] * x.shape[2] * x.shape[3]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
            "count": state["count"] + 1,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    y = (x.astype(jnp.float32) - mean[:, None, None]) * inv[:, None, None] \
        + params["bias"][:, None, None]
    return y.astype(x.dtype), new_state


# ------------------------------------------------------------------ conv ----

def conv2d_init(key, in_ch, out_ch, kernel_size, bias=True, dtype=jnp.float32):
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    kw, kb = jax.random.split(key)
    shape = (out_ch, in_ch) + tuple(kernel_size)
    params = {"w": kaiming_uniform_torch(kw, shape, dtype=dtype)}
    if bias:
        fan_in = in_ch * kernel_size[0] * kernel_size[1]
        params["b"] = torch_bias_uniform(kb, (out_ch,), fan_in, dtype=dtype)
    return params


def conv2d_apply(params, x, stride=1, padding=0):
    """NCHW conv with OIHW weights — bit-compatible with torch.nn.Conv2d."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, params["w"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=_DEFAULT,
    )
    if "b" in params:
        y = y + params["b"].astype(x.dtype)[:, None, None]
    return y


def conv_bn_apply(conv_params, bn_params, bn_state, x, training,
                  stride=1, padding=0, momentum=0.1, eps=1e-5):
    """conv -> BatchNorm, with the BN FOLDED INTO THE CONV in eval mode.

    Eval-mode BN is a per-channel affine; folding it into the conv weights
    (w' = w * g, b' = beta + (b - mean) * g, g = scale/sqrt(var+eps))
    removes a full elementwise fp32 pass over the activation — on the ResNet
    trunk's early layers that is GBs of HBM traffic per batch.  Training
    mode keeps the explicit BN (batch statistics + running-stat updates).

    Returns (y, new_bn_state).
    """
    if training:
        y = conv2d_apply(conv_params, x, stride=stride, padding=padding)
        return batchnorm_apply(bn_params, bn_state, y, training,
                               momentum=momentum, eps=eps)
    g = bn_params["scale"] * jax.lax.rsqrt(bn_state["var"] + eps)
    w = conv_params["w"] * g[:, None, None, None]
    b = bn_params["bias"] - bn_state["mean"] * g
    if "b" in conv_params:
        b = b + conv_params["b"] * g
    y = conv2d_apply({"w": w, "b": b}, x, stride=stride, padding=padding)
    return y, bn_state


# ------------------------------------------------------------------ pool ----

def max_pool_2d(x, window=3, stride=2, padding=1):
    """Max pool over NCHW, torch-compatible (pads with -inf).

    The init value MUST be the python scalar ``-jnp.inf`` (not a jnp array):
    JAX only recognizes the max-monoid — and can only transpose the op under
    jit-of-grad — for scalar identity constants.

    Backward note: autodiff lowers to XLA SelectAndScatter (~4.3 ms of the
    fp32 train step at batch 60, ~3.5x the HBM-traffic floor).  Measured
    alternatives all lost: interior-pad scatter accumulation 28 ms (9
    full-res materializations), output-parity planes + interleave 14.6 ms
    (lane-dim relayouts), candidate-expansion einsum masks 21.7 ms (needs
    HIGHEST-precision matmuls for bit-exact compares), separable 1-D pools
    6.8 ms, and a Pallas kernel needs lane-granularity interleaves in NCHW
    (or ~2 ms of layout transposes in NHWC) that cost more than the gap.
    """
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, window, window),
        window_strides=(1, 1, stride, stride),
        padding=((0, 0), (0, 0), (padding, padding), (padding, padding)),
    )


# ------------------------------------------------------------------- mlp ----

def gelu(x):
    """GELU matching torch.nn.GELU.

    fp32: exact erf form (torch default — bitwise parity for converted
    checkpoints).  bf16: tanh approximation — the erf polynomial costs ~8x
    more VPU time, and its difference from tanh-GELU (<1e-3 absolute) is
    below bf16 resolution, so the fast form is numerically free in the
    explicit speed mode."""
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def mlp_init(key, in_features, hidden_features=None, out_features=None,
             dtype=jnp.float32):
    """timm-style transformer MLP (``/root/reference/src/modules/vit_layers/
    mlp.py:8-26``): fc1 -> GELU -> fc2."""
    out_features = out_features or in_features
    hidden_features = hidden_features or in_features
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, in_features, hidden_features, dtype=dtype),
        "fc2": linear_init(k2, hidden_features, out_features, dtype=dtype),
    }


def mlp_apply(params, x):
    x = linear_apply(params["fc1"], x)
    x = gelu(x)
    return linear_apply(params["fc2"], x)
