"""Quaternion utilities (pure JAX).

Convention: quaternions are stored W-LAST, i.e. ``q = [qx, qy, qz, qw]``,
matching the reference framework's internal pose layout
(``/root/reference/src/data_readers/matterport.py:50-53`` stores W-last; the
7-D pose vector is ``[tx, ty, tz, qx, qy, qz, qw]``).

These functions replace two native dependencies of the reference:
  * lietorch's quaternion kernels (C++/CUDA)
  * scipy.spatial.transform.Rotation (compiled Cython), used by the
    InteriorNet/StreetLearn readers and eval CLIs
    (``/root/reference/src/data_readers/interiornet.py:93-94``,
    ``/root/reference/test_streetlearn_interiornet.py:100-107``).

All functions are batched over arbitrary leading dimensions and are
jit/grad/vmap-safe.
"""

import jax
import jax.numpy as jnp

# 3x3 geometry matmuls are tiny; run them at full fp32 precision regardless of
# the backend's default (TPU defaults to reduced-precision passes).
_HP = jax.lax.Precision.HIGHEST


def _matmul(a, b):
    return jnp.matmul(a, b, precision=_HP)


def quat_multiply(q1, q2):
    """Hamilton product q1 * q2, both ``(..., 4)`` W-last."""
    x1, y1, z1, w1 = jnp.split(q1, 4, axis=-1)
    x2, y2, z2, w2 = jnp.split(q2, 4, axis=-1)
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    return jnp.concatenate([x, y, z, w], axis=-1)


def quat_conjugate(q):
    """Conjugate (= inverse for unit quaternions), ``(..., 4)`` W-last."""
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors ``v (..., 3)`` by unit quaternions ``q (..., 4)``.

    Uses the efficient form  v' = v + 2*w*(u x v) + 2*u x (u x v)  with
    u = vector part of q.
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_to_matrix(q):
    """Unit quaternion ``(..., 4)`` W-last -> rotation matrix ``(..., 3, 3)``."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """Rotation matrix ``(..., 3, 3)`` -> unit quaternion ``(..., 4)`` W-last.

    Branch-free Shepperd's method (selects the numerically largest of the four
    candidate decodings), matching scipy's ``Rotation.as_quat`` output
    convention (x, y, z, w) up to global sign; the returned quaternion is
    sign-normalized to w >= 0.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate 4*q_i^2 - 1 style decodings; pick the most stable.
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-24))

    # case w: q = [ (m21-m12), (m02-m20), (m10-m01), qw2 ] / (2*sqrt(qw2))
    sw = 2.0 * safe_sqrt(qw2)
    cand_w = jnp.stack([(m21 - m12) / sw, (m02 - m20) / sw,
                        (m10 - m01) / sw, sw / 4.0], axis=-1)
    sx = 2.0 * safe_sqrt(qx2)
    cand_x = jnp.stack([sx / 4.0, (m01 + m10) / sx,
                        (m02 + m20) / sx, (m21 - m12) / sx], axis=-1)
    sy = 2.0 * safe_sqrt(qy2)
    cand_y = jnp.stack([(m01 + m10) / sy, sy / 4.0,
                        (m12 + m21) / sy, (m02 - m20) / sy], axis=-1)
    sz = 2.0 * safe_sqrt(qz2)
    cand_z = jnp.stack([(m02 + m20) / sz, (m12 + m21) / sz,
                        sz / 4.0, (m10 - m01) / sz], axis=-1)

    scores = jnp.stack([qx2, qy2, qz2, qw2], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([cand_x, cand_y, cand_z, cand_w], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1),
                            axis=-2)[..., 0, :]
    # sign-normalize to w >= 0
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    # normalize against accumulated fp error
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rotation_from_viewpoint(rotation_x, rotation_y):
    """Rotation matrix from (pitch=x, yaw=y) viewpoint angles.

    Replicates the reference's ``compute_rotation_matrix_from_viewpoint``
    (``/root/reference/src/data_readers/interiornet.py:27-43``;
    same code in streetlearn.py and test_streetlearn_interiornet.py:54-70):
    R = R_pitch(x) applied after R_yaw(-y), rows as written there.

    Args:
      rotation_x, rotation_y: arrays broadcastable to a common shape ``(...)``.
    Returns:
      ``(..., 3, 3)`` rotation matrices.
    """
    rotax = jnp.asarray(rotation_x, dtype=jnp.float32)
    rotay = -jnp.asarray(rotation_y, dtype=jnp.float32)
    c1, s1 = jnp.cos(rotax), jnp.sin(rotax)
    c2, s2 = jnp.cos(rotay), jnp.sin(rotay)
    zeros = jnp.zeros_like(c1)
    row1 = jnp.stack([c2, s1 * s2, c1 * s2], axis=-1)
    row2 = jnp.stack([zeros, c1, -s1], axis=-1)
    row3 = jnp.stack([-s2, s1 * c2, c1 * c2], axis=-1)
    return jnp.stack([row1, row2, row3], axis=-2)


def relative_rotation_from_viewpoints(x1, y1, x2, y2):
    """GT relative rotation R2 @ R1^T from two viewpoints.

    Mirrors ``compute_gt_rmat`` (``/root/reference/src/data_readers/
    interiornet.py:45-49``).
    """
    m1 = rotation_from_viewpoint(x1, y1)
    m2 = rotation_from_viewpoint(x2, y2)
    return _matmul(m2, jnp.swapaxes(m1, -1, -2))


def geodesic_angle_from_matrices(m1, m2):
    """Geodesic angle (radians) between rotation matrices ``(..., 3, 3)``.

    Mirrors ``compute_geodesic_distance_from_two_matrices``
    (``/root/reference/test_streetlearn_interiornet.py:37-47``).
    """
    m = _matmul(m1, jnp.swapaxes(m2, -1, -2))
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1.0) / 2.0
    cos = jnp.clip(cos, -1.0, 1.0)
    return jnp.arccos(cos)
