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

import jax.numpy as jnp

# ImageNet statistics (src/model.py:116-117)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


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
    if (in_h, in_w) == (out_h, out_w):
        return x
    rows = (jnp.arange(out_h) * in_h) // out_h
    cols = (jnp.arange(out_w) * in_w) // out_w
    return x[..., rows, :][..., cols]


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
