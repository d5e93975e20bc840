"""ViTEss — pair-of-images -> SE(3) relative pose (functional JAX).

TPU-native re-design of the reference model (``/root/reference/src/model.py``):
truncated ResNet-18 feature extractor -> 192-d tokens at 24x24 per image ->
(depth-1) ViT self-attention blocks -> Essential Matrix cross block ->
MLP pose regressor -> (B, 2, 7) poses.

Differences from the reference implementation (same math, TPU-first design):
  * pure function of (params, state, images, intrinsics) — jit/vmap/pjit
    freely; BatchNorm statistics flow through an explicit state pytree;
  * positional-encoding tables are computed inside the jitted graph (XLA
    constant-folds them for fixed intrinsics) instead of per-step CPU
    construction + host->device copy (ref ``vision_transformer.py:209-211``);
  * all preprocessing (BGR flip, normalize, nearest resize) is fused into the
    same XLA program (ref does it eagerly on device, ``src/model.py:115-125``);
  * optional bf16 compute path for the MXU (config.compute_dtype).

All three reference ablation paths are implemented: the essential-matrix
fusion transformer (default), ``--noess`` (plain cross-attention + conv
pooling head), and the no-fusion-transformer conv pooling baseline.
"""

import os

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..nn.init import xavier_uniform
from ..nn.layers import (
    linear_init, linear_apply, layernorm_init, layernorm_apply,
    conv2d_init, batchnorm_init, conv_bn_apply, mlp_init, mlp_apply,
)
from ..nn.resnet import resnet18_trunk_init, resnet18_trunk_apply
from ..nn.extractor import residual_block_init, residual_block_apply
from ..nn.transformer import vit_block_init
from ..ops.image import (IMAGENET_MEAN, IMAGENET_STD, nearest_resize,
                         s2d_nearest_resize, scale_intrinsics)
from ..ops.posenc import quadratic_positional_encoding, l1_positional_encoding
from ..ops.essential import (
    cross_attention_init, essential_cross_attention,
    essential_cross_attention_pair, noess_cross_attention,
)


# ------------------------------------------------------------------ init ----

def vitess_init(key, cfg: ModelConfig, dtype=jnp.float32):
    """Build the (params, state) pytrees.

    Mirrors ``ViTEss.__init__`` (``src/model.py:12-98``).  ResNet weights are
    randomly initialized — ImageNet-pretrained values arrive via the
    checkpoint converter (the reference also overwrites them when loading any
    trained checkpoint, ``src/model.py:31`` comment).
    """
    C = cfg.total_num_features
    keys = jax.random.split(key, 16)
    params, state = {}, {}

    params["resnet"], state["resnet"] = resnet18_trunk_init(keys[0], dtype)
    k_extract = 28 - cfg.feature_height + 1   # = 5 (src/model.py:24)
    params["extractor_final_conv"], state["extractor_final_conv"] = \
        residual_block_init(keys[1], 128, C, k_extract, dtype)

    if cfg.fusion_transformer:
        params["pos_embed"] = xavier_uniform(
            keys[2], (1, cfg.num_patches, C), dtype)
        blocks = []
        for i in range(cfg.transformer_depth - 1):
            blocks.append(vit_block_init(keys[3 + i], C, cfg.num_heads,
                                         dtype=dtype))
        params["blocks"] = blocks
        kc1, kc2 = jax.random.split(keys[12])
        params["cross_block"] = {
            "norm1": layernorm_init(C, dtype),
            "cross_attn": cross_attention_init(
                kc1, C, cfg.num_heads, qkv_bias=True, noess=cfg.noess,
                no_pos_encoding=cfg.no_pos_encoding, dtype=dtype),
            "norm2": layernorm_init(C, dtype),
            "mlp": mlp_init(kc2, C, int(C * 4.0), dtype=dtype),
        }
        params["norm"] = layernorm_init(C, dtype)
    else:
        # conv pooling head (src/model.py:64-70)
        kp1, kp2 = jax.random.split(keys[2])
        params["pool_transformer_output"] = {
            "conv1": conv2d_init(kp1, C, cfg.pool_feat1, 1, dtype=dtype),
            "conv2": conv2d_init(kp2, cfg.pool_feat1, cfg.pool_size, 1,
                                 dtype=dtype),
        }
        st = {}
        params["pool_transformer_output"]["bn1"], st["bn1"] = \
            batchnorm_init(cfg.pool_feat1, dtype)
        params["pool_transformer_output"]["bn2"], st["bn2"] = \
            batchnorm_init(cfg.pool_size, dtype)
        state["pool_transformer_output"] = st

    if cfg.noess:
        # (src/model.py:72-81): pool 2C -> pool_feat1 -> 43
        kp1, kp2 = jax.random.split(keys[13])
        params["pool_attn"] = {
            "conv1": conv2d_init(kp1, C * 2, cfg.pool_feat1, 1, dtype=dtype),
            "conv2": conv2d_init(kp2, cfg.pool_feat1, 43, 1, dtype=dtype),
        }
        st = {}
        params["pool_attn"]["bn1"], st["bn1"] = \
            batchnorm_init(cfg.pool_feat1, dtype)
        params["pool_attn"]["bn2"], st["bn2"] = batchnorm_init(43, dtype)
        state["pool_attn"] = st

    H, H2 = cfg.regressor_input_dim, cfg.fc_hidden_size
    kr = jax.random.split(keys[14], 3)
    params["pose_regressor"] = {
        "fc1": linear_init(kr[0], H, H2, dtype=dtype),
        "fc2": linear_init(kr[1], H2, H2, dtype=dtype),
        "fc3": linear_init(kr[2], H2,
                           cfg.num_images * cfg.pose_size, dtype=dtype),
    }
    return params, state


# ------------------------------------------------------------- submodules ----

def _extract_features(params, state, cfg, images, intrinsics, training):
    """``ViTEss.extract_features`` (``src/model.py:111-143``).

    images: (B, 2, 3, H, W) raw BGR floats 0-255.
    Returns (tokens (2B, N, C'), scaled intrinsics, new_state).
    """
    B = images.shape[0]
    if intrinsics is not None:
        intrinsics = scale_intrinsics(intrinsics, images.shape,
                                      cfg.feature_resolution)

    # Nearest resize is a pure gather, so it commutes EXACTLY with the
    # elementwise normalization — resize first (fewer pixels to normalize;
    # the reference normalizes then resizes, same result).  In bf16 mode the
    # cast happens before normalization to halve the elementwise traffic.
    # uint8 input is accepted (what image decode actually produces — 4x less
    # host->device + first-read traffic); 0-255 integers are exact in bf16
    # (8 significand bits), so the uint8 path is bitwise-identical.
    #
    # The reference's BGR->RGB flip + /255 + ImageNet mean/std
    # (``src/model.py:115-118``) are FOLDED INTO conv1: with
    #   y_j = x_j - 255*mean_{2-j}           (x in raw BGR order)
    #   w'[o, j] = w[o, 2-j] / (255*std_{2-j})
    # the normalized RGB input the reference convolves is exactly
    # n_c = y_{2-c}/(255*std_c), so conv_{w'}(y) == conv_w(n) — including
    # the zero-padding ring, since n == 0 where y == 0.  This removes the
    # whole normalize pass (one elementwise read+write of the 224x224
    # batch) from the hot path; only the mean subtraction remains, fused
    # by XLA into the cast.
    x = images.reshape((B * 2,) + images.shape[2:])
    # Eval stem: fuse a 2x2 space-to-depth into the resize gather so conv1
    # runs as the MXU-aligned C_in=12 4x4/s1 phase conv instead of the
    # emitter-bound C_in=3 7x7/s2 (same arithmetic; ~1.3 ms off the eval
    # step at batch 256 pairs — see ops/image.s2d_nearest_resize and
    # nn/resnet.fold_stem_s2d).  Training keeps the plain conv (the
    # backward through 4 phase gathers is a scatter; not measured to win).
    s2d = not os.environ.get("RELPOSE_NO_S2D_STEM") and (
        not training or bool(os.environ.get("RELPOSE_S2D_TRAIN")))
    x = s2d_nearest_resize(x, 224) if s2d else nearest_resize(x, 224)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if x.dtype != dt:
        x = x.astype(dt)
    mean_bgr = jnp.asarray(
        [255.0 * m for m in IMAGENET_MEAN[::-1]], dt).reshape(3, 1, 1)
    x = x - (jnp.tile(mean_bgr, (4, 1, 1)) if s2d else mean_bgr)

    rp = params["resnet"]
    w1 = rp["conv1"]["w"]
    inv_std_bgr = jnp.asarray(
        [1.0 / (255.0 * s) for s in IMAGENET_STD[::-1]],
        w1.dtype).reshape(1, 3, 1, 1)
    rp = dict(rp, conv1=dict(rp["conv1"], w=w1[:, ::-1] * inv_std_bgr))

    new_state = {}
    x, new_state["resnet"] = resnet18_trunk_apply(
        rp, state["resnet"], x, training, s2d_stem=s2d)
    x, new_state["extractor_final_conv"] = residual_block_apply(
        params["extractor_final_conv"], state["extractor_final_conv"], x,
        training)

    # (2B, C, 24, 24) -> (2B, C, N) -> (2B, N, C') ; row-major tokens
    x = x.reshape(B * 2, cfg.total_num_features, cfg.num_patches)
    if not cfg.fusion_transformer:
        x = x[:, : cfg.total_num_features // 2]
    if not _vit_cf(cfg):
        # with the channels-first lever the ViT megakernel ingests the
        # extractor's natural (2B, C, N) layout and transposes in VMEM
        x = jnp.swapaxes(x, 1, 2)
    return x, intrinsics, new_state


def _vit_cf(cfg):
    """RELPOSE_VIT_CF=1: skip the XLA (2B, C, N) -> (2B, N, C) token
    transpose (a full HBM round trip — the ViT kernel is an opaque
    consumer) and let the megakernel transpose in VMEM.  A/B lever pending
    hardware measurement (scripts/hw_revalidate.sh)."""
    from ..ops.runtime import use_pallas
    return (cfg.fusion_transformer and bool(os.environ.get("RELPOSE_VIT_CF"))
            and use_pallas())


def _positional(cfg, intrinsics, batch):
    if cfg.no_pos_encoding:
        return None
    fn = (l1_positional_encoding if cfg.l1_pos_encoding
          else quadratic_positional_encoding)
    return fn(cfg.num_patches, intrinsics, batch=batch)


def _cross_block(params, cfg, x, intrinsics):
    """``CrossBlock.forward`` (``vision_transformer.py:285-304``).

    x: (2B, N, C) interleaved pair tokens.
    Returns (2B, 70, C) for the essential path or (2B, N, C) for --noess.
    """
    two_b, N, C = x.shape
    xp = x.reshape(-1, 2, N, C)

    if not cfg.noess:
        positional = _positional(cfg, intrinsics, xp.shape[0])
        # norm1 + pair split + qkv all fold into the essential kernel: as
        # separate XLA ops each materializes the full token tensors in HBM
        # (the Mosaic call is opaque to fusion).  RELPOSE_EB_NO_PAIR=1
        # restores the round-3 path (separate XLA LN + the qkv-fused
        # kernel) as the hardware A/B lever.
        if os.environ.get("RELPOSE_EB_NO_PAIR"):
            x1 = layernorm_apply(params["norm1"], xp[:, 0])
            x2 = layernorm_apply(params["norm1"], xp[:, 1])
            f1, f2 = essential_cross_attention(
                params["cross_attn"], x1, x2, positional, cfg.num_heads,
                cross_features=cfg.cross_features,
                use_single_softmax=cfg.use_single_softmax)
        else:
            f1, f2 = essential_cross_attention_pair(
                params["cross_attn"], params["norm1"], xp, positional,
                cfg.num_heads, cross_features=cfg.cross_features,
                use_single_softmax=cfg.use_single_softmax)
        # (B, 2, e, C) -> (2B, e, C); residual MLP (token count changed, so
        # no residual around the attention itself)
        fund = jnp.stack([f1, f2], axis=1).reshape(two_b, -1, C)
        fund = fund + mlp_apply(params["mlp"],
                                layernorm_apply(params["norm2"], fund))
        return fund
    else:
        x1 = layernorm_apply(params["norm1"], xp[:, 0])
        x2 = layernorm_apply(params["norm1"], xp[:, 1])
        y1, y2 = noess_cross_attention(params["cross_attn"], x1, x2,
                                       cfg.num_heads)
        x_inter = jnp.stack([y1, y2], axis=1).reshape(two_b, N, C)
        x = x + x_inter
        x = x + mlp_apply(params["mlp"], layernorm_apply(params["norm2"], x))
        return x


def _conv_pool_head(params, state, x, training):
    """1x1-conv pooling heads (pool_transformer_output / pool_attn,
    ``src/model.py:64-81``): conv -> BN -> ReLU -> conv -> BN."""
    new_state = {}
    y, new_state["bn1"] = conv_bn_apply(params["conv1"], params["bn1"],
                                        state["bn1"], x, training)
    y = jax.nn.relu(y)
    y, new_state["bn2"] = conv_bn_apply(params["conv2"], params["bn2"],
                                        state["bn2"], y, training)
    return y, new_state


def normalize_preds(Gs, pose_preds):
    """``ViTEss.normalize_preds`` (``src/model.py:145-159``): re-normalize the
    quaternion block with floor max(|q|, 0.01) and pin pose 0 to the input
    identity.  Gs, pose_preds: (B, 2, 7)."""
    q = pose_preds[..., 3:]
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, 0.01)
    normed = jnp.concatenate([pose_preds[..., :3], q], axis=-1)
    return jnp.concatenate([Gs[:, :1], normed[:, 1:]], axis=1)


# --------------------------------------------------------------- forward ----

def vitess_forward(params, state, cfg: ModelConfig, images, intrinsics=None,
                   Gs=None, training=False):
    """``ViTEss.forward`` (``src/model.py:161-191``).

    Args:
      images: (B, 2, 3, H, W) raw BGR floats 0-255 (cv2 layout).
      intrinsics: (B, 2, 4) [fx, fy, cx, cy] at input resolution, or None.
      Gs: (B, 2, 7) input poses (pose 0 is pinned into the output); defaults
        to identity.
      training: BatchNorm mode switch.

    Returns:
      (poses (B, 2, 7) float32, new_state)
    """
    B = images.shape[0]
    if Gs is None:
        Gs = jnp.zeros((B, 2, 7), jnp.float32).at[..., 6].set(1.0)

    new_state = dict(state)
    feats, intr, st = _extract_features(params, state, cfg, images,
                                        intrinsics, training)
    new_state.update(st)

    if cfg.fusion_transformer:
        from ..ops.pallas_vit import fused_vit_stack
        # positional add rides the kernel (VMEM; as an XLA op it pays a
        # full HBM round trip of the tokens since the kernel is opaque)
        x = fused_vit_stack(feats, params["blocks"], cfg.num_heads,
                            pos=params["pos_embed"],
                            channels_first=_vit_cf(cfg))
        x = _cross_block(params["cross_block"], cfg, x, intr)
        features = layernorm_apply(params["norm"], x)
    else:
        # (2B, N, 96) -> (B, 24, 24, 192) -> NCHW -> conv pool
        rf = feats.reshape(-1, cfg.feature_height, cfg.feature_width,
                           cfg.total_num_features)
        rf = jnp.transpose(rf, (0, 3, 1, 2))
        features, st = _conv_pool_head(
            params["pool_transformer_output"],
            state["pool_transformer_output"], rf, training)
        new_state["pool_transformer_output"] = st

    if cfg.noess:
        # (2B, N, C) -> (B, 24, 24, 2C) -> NCHW -> pool_attn -> flatten
        f = features.reshape(B, cfg.feature_height, cfg.feature_width, -1)
        f = jnp.transpose(f, (0, 3, 1, 2))
        pooled, st = _conv_pool_head(params["pool_attn"], state["pool_attn"],
                                     f, training)
        new_state["pool_attn"] = st
        flat = pooled.reshape(B, -1)
    else:
        flat = features.reshape(B, -1)

    flat = flat.astype(jnp.float32)
    y = linear_apply(params["pose_regressor"]["fc1"], flat)
    y = jax.nn.relu(y)
    y = linear_apply(params["pose_regressor"]["fc2"], y)
    y = jax.nn.relu(y)
    y = linear_apply(params["pose_regressor"]["fc3"], y)
    pose_preds = y.reshape(B, cfg.num_images, cfg.pose_size)

    return normalize_preds(Gs, pose_preds), new_state
