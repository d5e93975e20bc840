"""Epipolar geometry utilities (pure JAX/numpy-compatible).

Re-implements the math of the reference's visualization tool
(``/root/reference/generate_epipolar_imgs.py``): essential matrix from a
relative pose E = [t]x R, fundamental matrix F = K2^-T E K1^-1, and epipolar
line computation for points in the first image.
"""

import jax
import jax.numpy as jnp

from .quaternion import quat_to_matrix

_HP = jax.lax.Precision.HIGHEST


def skew(t):
    """Cross-product matrix [t]x of ``(..., 3)`` -> ``(..., 3, 3)``.

    Mirrors ``generate_epipolar_imgs.py:114-117``.
    """
    x, y, z = t[..., 0], t[..., 1], t[..., 2]
    zeros = jnp.zeros_like(x)
    m = jnp.stack([zeros, -z, y,
                   z, zeros, -x,
                   -y, x, zeros], axis=-1)
    return m.reshape(t.shape[:-1] + (3, 3))


def essential_from_pose(pose):
    """E = [t]x R from a 7-D pose ``(..., 7) = [t, q]``
    (``generate_epipolar_imgs.py:107-118``)."""
    R = quat_to_matrix(pose[..., 3:])
    return jnp.matmul(skew(pose[..., :3]), R, precision=_HP)


def fundamental_from_essential(E, K1, K2):
    """F = K2^-T E K1^-1 (``generate_epipolar_imgs.py:104-105``)."""
    K2_inv_T = jnp.swapaxes(jnp.linalg.inv(K2), -1, -2)
    return jnp.matmul(jnp.matmul(K2_inv_T, E, precision=_HP), jnp.linalg.inv(K1), precision=_HP)


def compute_correspond_epilines(points_h, F):
    """Epipolar lines in image 2 for homogeneous points ``(..., N, 3)`` in
    image 1, normalized so the (a, b) normal has unit length
    (``generate_epipolar_imgs.py:85-102``).

    Returns ``(..., N, 3)`` line coefficients (a, b, c): a*x + b*y + c = 0.
    """
    lines = jnp.einsum("...ij,...nj->...ni", F, points_h, precision=_HP)
    a, b = lines[..., 0], lines[..., 1]
    nu = a * a + b * b
    nu = jnp.where(nu > 0.0, 1.0 / jnp.sqrt(jnp.maximum(nu, 1e-30)),
                   jnp.ones_like(nu))
    return lines * nu[..., None]


def epiline_slope_intercept(line):
    """(a, b, c) line -> (m, b) slope/intercept form y = m*x + b
    (``generate_epipolar_imgs.py:128-131``)."""
    m = -line[..., 0] / line[..., 1]
    b = -line[..., 2] / line[..., 1]
    return m, b
