"""ResNet-18 trunk (stem + layer1 + layer2), functional JAX.

The reference uses torchvision's resnet18 but only runs
conv1/bn1/relu/maxpool/layer1/layer2 in its forward
(``/root/reference/src/model.py:127-132``); layer3/layer4/fc are frozen and
never executed (``/root/reference/train.py:59-64``).  We therefore build only
the executed trunk.  Arithmetic matches torchvision BasicBlock exactly so
converted checkpoints reproduce reference activations:

  stem:   conv 7x7/2 pad3 (3->64) -> BN -> ReLU -> maxpool 3x3/2 pad1
  layer1: 2x BasicBlock(64->64, stride 1)
  layer2: BasicBlock(64->128, stride 2, 1x1 downsample) + BasicBlock(128)
  BasicBlock: conv3x3/s -> BN -> ReLU -> conv3x3 -> BN; (+ downsample) -> ReLU

Output for 224x224 input: (N, 128, 28, 28).
"""

import jax
import jax.numpy as jnp

from .layers import (
    conv2d_init, batchnorm_init, conv_bn_apply, conv2d_apply, max_pool_2d,
)


def s2d_scatter_weights(w):
    """Scatter 7x7/s2 conv taps ``(O, C, 7, 7)`` into the 2x2-phase
    4x4/s1 kernel ``(O, 4C, 4, 4)`` matching
    ``ops.image.s2d_nearest_resize``.

    Tap geometry: output row ``oh`` reads resized rows ``2*oh + kh - 3``;
    phase ``pr = (kh+1) % 2`` holds rows ``2t + pr``, so the 4-tap phase
    window is ``t = oh - 2 + a`` with ``a = (kh-3)//2 + 2`` (kh odd,
    pr=0) or ``a = kh//2`` (kh even, pr=1) — i.e. conv padding
    ``((2, 1), (2, 1))``.  49 of the 192 (12 x 4 x 4) slots are nonzero;
    the zero-padded ring of the resized image maps exactly to the phase
    conv's own zero padding, so outputs are bit-for-bit the plain
    conv's up to fp accumulation order.
    """
    zcol = jnp.zeros(w.shape[:2] + (1, w.shape[3]), w.dtype)
    rows = {0: jnp.concatenate([zcol, w[:, :, 1::2]], axis=2),   # kh odd
            1: w[:, :, 0::2]}                                    # kh even
    zrow = jnp.zeros(w.shape[:2] + (4, 1), w.dtype)
    parts = []
    for pr in range(2):
        for pc in range(2):
            sub = rows[pr]
            sub = (jnp.concatenate([zrow, sub[:, :, :, 1::2]], axis=3)
                   if pc == 0 else sub[:, :, :, 0::2])
            parts.append(sub)
    return jnp.concatenate(parts, axis=1)


def fold_stem_s2d(conv1, bn_params, bn_state, eps=1e-5):
    """Fold eval-mode BN into conv1 and scatter into the 2x2-phase kernel
    (``s2d_scatter_weights``).  Returns ``(w2 (O, 4C, 4, 4), bias (O,))``
    ready for ``conv2d_apply(..., stride=1, padding=((2, 1), (2, 1)))``."""
    g = bn_params["scale"] * jax.lax.rsqrt(bn_state["var"] + eps)
    w = conv1["w"] * g[:, None, None, None]          # (O, C, 7, 7)
    bias = bn_params["bias"] - bn_state["mean"] * g
    if "b" in conv1:
        bias = bias + conv1["b"] * g
    return s2d_scatter_weights(w), bias


def _basic_block_init(key, in_ch, out_ch, stride, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    params, state = {}, {}
    params["conv1"] = conv2d_init(k1, in_ch, out_ch, 3, bias=False, dtype=dtype)
    params["bn1"], state["bn1"] = batchnorm_init(out_ch, dtype)
    params["conv2"] = conv2d_init(k2, out_ch, out_ch, 3, bias=False, dtype=dtype)
    params["bn2"], state["bn2"] = batchnorm_init(out_ch, dtype)
    if stride != 1 or in_ch != out_ch:
        params["downsample_conv"] = conv2d_init(k3, in_ch, out_ch, 1,
                                                bias=False, dtype=dtype)
        params["downsample_bn"], state["downsample_bn"] = \
            batchnorm_init(out_ch, dtype)
    return params, state


def _basic_block_apply(params, state, x, stride, training):
    new_state = {}
    y, new_state["bn1"] = conv_bn_apply(params["conv1"], params["bn1"],
                                        state["bn1"], x, training,
                                        stride=stride, padding=1)
    y = jax.nn.relu(y)
    y, new_state["bn2"] = conv_bn_apply(params["conv2"], params["bn2"],
                                        state["bn2"], y, training,
                                        stride=1, padding=1)
    if "downsample_conv" in params:
        x, new_state["downsample_bn"] = conv_bn_apply(
            params["downsample_conv"], params["downsample_bn"],
            state["downsample_bn"], x, training, stride=stride)
    return jax.nn.relu(x + y), new_state


def resnet18_trunk_init(key, dtype=jnp.float32):
    keys = jax.random.split(key, 5)
    params, state = {}, {}
    params["conv1"] = conv2d_init(keys[0], 3, 64, 7, bias=False, dtype=dtype)
    params["bn1"], state["bn1"] = batchnorm_init(64, dtype)
    params["layer1_0"], state["layer1_0"] = _basic_block_init(
        keys[1], 64, 64, 1, dtype)
    params["layer1_1"], state["layer1_1"] = _basic_block_init(
        keys[2], 64, 64, 1, dtype)
    params["layer2_0"], state["layer2_0"] = _basic_block_init(
        keys[3], 64, 128, 2, dtype)
    params["layer2_1"], state["layer2_1"] = _basic_block_init(
        keys[4], 128, 128, 1, dtype)
    return params, state


def resnet18_trunk_apply(params, state, x, training=False, s2d_stem=False):
    """(N, 3, 224, 224) -> (N, 128, 28, 28).  Returns (y, new_state).

    With ``s2d_stem`` (eval only), ``x`` is the (N, 12, 112, 112) 2x2-phase
    tensor from ``ops.image.s2d_nearest_resize`` and conv1 runs as the
    folded 4x4/s1 phase conv (``fold_stem_s2d``) — the MXU-aligned C_in=12
    form of the same arithmetic (3.60 vs 4.94 ms for pre+conv1+pool at
    eval batch 512 images, v5e bf16)."""
    new_state = {}
    if s2d_stem and not training:
        w2, bias = fold_stem_s2d(params["conv1"], params["bn1"],
                                 state["bn1"])
        y = conv2d_apply({"w": w2, "b": bias}, x, stride=1,
                         padding=((2, 1), (2, 1)))
        new_state["bn1"] = state["bn1"]
    elif s2d_stem:
        # training: BN can't fold (batch statistics), but the phase conv
        # still fixes the C_in=3 emitter bound for BOTH the forward and
        # the dW backward, and the phase gather has no backward at all
        # (images are not differentiated).
        from .layers import batchnorm_apply
        cp = {"w": s2d_scatter_weights(params["conv1"]["w"])}
        if "b" in params["conv1"]:
            cp["b"] = params["conv1"]["b"]
        y = conv2d_apply(cp, x, stride=1, padding=((2, 1), (2, 1)))
        y, new_state["bn1"] = batchnorm_apply(params["bn1"], state["bn1"],
                                              y, training)
    else:
        y, new_state["bn1"] = conv_bn_apply(params["conv1"], params["bn1"],
                                            state["bn1"], x, training,
                                            stride=2, padding=3)
    y = jax.nn.relu(y)
    y = max_pool_2d(y, window=3, stride=2, padding=1)
    y, new_state["layer1_0"] = _basic_block_apply(
        params["layer1_0"], state["layer1_0"], y, 1, training)
    y, new_state["layer1_1"] = _basic_block_apply(
        params["layer1_1"], state["layer1_1"], y, 1, training)
    y, new_state["layer2_0"] = _basic_block_apply(
        params["layer2_0"], state["layer2_0"], y, 2, training)
    y, new_state["layer2_1"] = _basic_block_apply(
        params["layer2_1"], state["layer2_1"], y, 1, training)
    return y, new_state
