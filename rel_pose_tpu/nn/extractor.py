"""Residual conv block bridging the ResNet trunk to the transformer tokens.

Functional equivalent of the reference's ``ResidualBlock(128, 192, 'batch',
kernel_size=5)`` (``/root/reference/src/modules/extractor.py:5-65``,
instantiated at ``src/model.py:33``): consumes the (N, 128, 28, 28) layer2
map and produces (N, 192, 24, 24).

Structure for norm='batch', kernel_size=k>1, stride=1:
  y = relu(BN(conv3x3 pad1 (in->out)))
  y = relu(BN(conv kxk no-pad (out->out)))
  x = BN(conv kxk no-pad stride1 (in->out))        # "downsample" branch
  out = relu(x + y)

The reference's channel pad/crop fixups (extractor.py:59-63) never trigger in
this configuration (downsample output channels == y channels) and are omitted.
Only the configuration the model actually builds is implemented; stride>1 and
other norms are out of scope of the reference's runtime graph.
"""

import jax
import jax.numpy as jnp

from .layers import conv2d_init, batchnorm_init, conv_bn_apply


def residual_block_init(key, in_ch, out_ch, kernel_size, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    params, state = {}, {}
    params["conv1"] = conv2d_init(k1, in_ch, out_ch, 3, bias=True, dtype=dtype)
    params["norm1"], state["norm1"] = batchnorm_init(out_ch, dtype)
    params["conv2"] = conv2d_init(k2, out_ch, out_ch, kernel_size, bias=True,
                                  dtype=dtype)
    params["norm2"], state["norm2"] = batchnorm_init(out_ch, dtype)
    params["downsample_conv"] = conv2d_init(k3, in_ch, out_ch, kernel_size,
                                            bias=True, dtype=dtype)
    params["norm3"], state["norm3"] = batchnorm_init(out_ch, dtype)
    return params, state


def residual_block_apply(params, state, x, training=False):
    """(N, in, H, W) -> (N, out, H-k+1, W-k+1).  Returns (y, new_state)."""
    new_state = {}
    y, new_state["norm1"] = conv_bn_apply(params["conv1"], params["norm1"],
                                          state["norm1"], x, training,
                                          stride=1, padding=1)
    y = jax.nn.relu(y)
    y, new_state["norm2"] = conv_bn_apply(params["conv2"], params["norm2"],
                                          state["norm2"], y, training,
                                          stride=1, padding=0)
    y = jax.nn.relu(y)

    x, new_state["norm3"] = conv_bn_apply(params["downsample_conv"],
                                          params["norm3"], state["norm3"],
                                          x, training, stride=1, padding=0)
    return jax.nn.relu(x + y), new_state
