"""Jitted image preprocessing ops.

Replaces the reference's in-model torch preprocessing
(``/root/reference/src/model.py:111-125``) with XLA-compiled equivalents:
BGR->RGB channel flip, /255 + ImageNet normalization, and the
``F.interpolate(size=...)`` resize.

IMPORTANT: torch's ``F.interpolate`` defaults to mode='nearest' — the
reference resizes with NEAREST-NEIGHBOR everywhere (model.py:125,
augmentation.py:37, test_matterport.py:125, demo.py:72).  Torch's legacy
nearest picks source index ``floor(i * in/out)``; ``jax.image.resize``'s
nearest uses half-pixel centers and differs.  We implement torch's exact
semantics with integer gather indices (cheap, fully fused by XLA).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet statistics (src/model.py:116-117)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _axis_nearest_take(x, axis, n_in, n_out):
    """Take ``floor(i * n_in / n_out)`` along one axis, expressed through the
    index pattern's periodicity: with g = gcd(n_in, n_out) the pattern
    repeats every n_in/g source elements, so reshaping the axis to
    (g, n_in/g) reduces the full-length gather to a tiny per-block one —
    and for the common pure-downscale ratios (256->224 is 8->7, 480->384 and
    640->512 are 5->4) the block indices are contiguous, turning the whole
    resize into a strided slice (pure DMA, ~2x faster on TPU than the
    full-length gather this replaces)."""
    if n_in == n_out:
        return x
    g = math.gcd(n_in, n_out)
    bi, bo = n_in // g, n_out // g
    idx = (np.arange(bo) * bi) // bo
    ax = axis % x.ndim
    shape = x.shape
    x = x.reshape(shape[:ax] + (g, bi) + shape[ax + 1:])
    if bo == idx[-1] + 1 and np.array_equal(idx, np.arange(bo)):
        x = jax.lax.slice_in_dim(x, 0, bo, axis=ax + 1)
    else:
        # cover the block indices with greedy maximal arithmetic
        # progressions -> a concat of (strided) slices instead of a gather;
        # e.g. 384->224 is blocks of 12->7, idx [0,1,3,5,6,8,10] = 3 APs,
        # and 512->224 is 16->7, idx [0,2,4,6,9,11,13] = 2 stride-2 APs
        if np.any(np.diff(idx) <= 0):
            # upscale (repeated indices) — slices can't duplicate; gather
            return jnp.take(x, jnp.asarray(idx), axis=ax + 1).reshape(
                shape[:ax] + (n_out,) + shape[ax + 1:])
        aps = []  # (start, count, stride)
        i = 0
        while i < len(idx):
            if i + 1 == len(idx):
                aps.append((int(idx[i]), 1, 1))
                break
            step = int(idx[i + 1] - idx[i])
            j = i + 1
            while j + 1 < len(idx) and int(idx[j + 1] - idx[j]) == step:
                j += 1
            aps.append((int(idx[i]), j - i + 1, step))
            i = j + 1
        if len(aps) == 1:
            s, c, st = aps[0]
            x = jax.lax.slice_in_dim(x, s, s + (c - 1) * st + 1, stride=st,
                                     axis=ax + 1)
        else:
            # multi-AP patterns (384->224 is 3 APs, 512->224 is 2): the
            # slice+concat form was measured SLOWER than one gather on v5e
            # (1.68 vs 1.44 ms for the train-shape resize at batch 120 —
            # lane-dim concats relayout); a single slice (the eval 8->7
            # case) still beats the gather ~2x, so only it keeps the
            # slice path
            x = jnp.take(x, jnp.asarray(idx), axis=ax + 1)
    return x.reshape(shape[:ax] + (n_out,) + shape[ax + 1:])


def nearest_resize(x, size):
    """Resize the last two (H, W) axes with torch F.interpolate 'nearest'
    semantics: src = floor(dst * in/out), exact via integer arithmetic.

    Args:
      x: ``(..., H, W)``.
      size: int or (out_h, out_w).
    """
    if isinstance(size, int):
        size = (size, size)
    out_h, out_w = size
    in_h, in_w = x.shape[-2], x.shape[-1]
    x = _axis_nearest_take(x, -2, in_h, out_h)
    return _axis_nearest_take(x, -1, in_w, out_w)


def s2d_nearest_resize(x, size):
    """Nearest-resize (torch semantics) fused with a 2x2 space-to-depth:
    ``(..., C, H, W) -> (..., 4C, size/2, size/2)`` where output channel
    ``(pr*2 + pc)*C + c`` holds the resized image's phase
    ``resized[c, pr::2, pc::2]``.

    Motivation (eval stem): the 7x7/s2/p3 conv1 at C_in=3 is bound by
    XLA's small-channel conv emitter, and the round-2 space-to-depth
    attempt lost 4% end-to-end because the phase relayout was a separate
    materialized transpose on an odd 115x115 grid.  Here the phase split
    rides the resize gather itself — four per-phase gathers fused into a
    channel concat write the phase tensor directly (SAME bytes as the
    plain resize; measured 1.23 vs 1.31 ms at eval batch 512 images on
    v5e — the blocked transpose form costs 1.45 and was rejected).  The
    even 112x112 phase grid then takes a C_in=12 4x4/s1 conv with
    padding ((2,1),(2,1)) (see ``nn.resnet.fold_stem_s2d``): 3.60 vs
    4.94 ms for pre+conv1+pool.
    """
    if isinstance(size, int):
        size = (size, size)
    out_h, out_w = size
    in_h, in_w = x.shape[-2], x.shape[-1]
    idx_h = (np.arange(out_h) * in_h) // out_h
    idx_w = (np.arange(out_w) * in_w) // out_w
    parts = []
    for pr in range(2):
        xr = jnp.take(x, jnp.asarray(idx_h[pr::2]), axis=-2)
        for pc in range(2):
            parts.append(jnp.take(xr, jnp.asarray(idx_w[pc::2]), axis=-1))
    return jnp.concatenate(parts, axis=-3)


def preprocess_images(images):
    """BGR 0-255 float images -> normalized RGB tensors.

    Mirrors ``ViTEss.extract_features``'s in-place normalization
    (``src/model.py:115-118``): channel flip [2,1,0], /255, ImageNet
    mean/std.  Works on ``(..., 3, H, W)``.
    """
    images = images[..., ::-1, :, :] / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, dtype=images.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=images.dtype)
    shape = (3,) + (1,) * 2
    return (images - mean.reshape(shape)) / std.reshape(shape)


def scale_intrinsics(intrinsics, input_hw, grid_hw=(24, 24)):
    """Rescale pinhole intrinsics ``(..., 4) = [fx, fy, cx, cy]`` from the
    input image resolution to the feature-grid resolution
    (``ViTEss.update_intrinsics``, ``src/model.py:100-109``)."""
    sizey, sizex = grid_hw
    scalex = sizex / input_hw[-1]
    scaley = sizey / input_hw[-2]
    scale = jnp.asarray([scalex, scaley, scalex, scaley],
                        dtype=intrinsics.dtype)
    return intrinsics * scale
