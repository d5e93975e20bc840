"""Pure-JAX SE(3)/SO(3) Lie-group ops on 7-D pose vectors.

This module is the TPU-native replacement for the lietorch C++/CUDA extension
used by the reference (``/root/reference/environment.yml:20``; API surface
used: ``SE3(data7)``, ``SE3.IdentityLike``, compose ``*``, ``.inv()``,
``.log()`` — see ``/root/reference/src/geom/losses.py:3-21`` and
``/root/reference/train.py:144-146``).

Pose layout: ``(..., 7) = [tx, ty, tz, qx, qy, qz, qw]`` (translation, then
W-last unit quaternion).  Tangent layout: ``(..., 6) = [tau (3), phi (3)]``
(translational part first), matching lietorch's ``.log()`` split in the
reference loss (``losses.py:12``).

Numerical notes: all small-angle branches use the
``where(small, taylor, f(safe_x))`` idiom so both primal values AND gradients
are finite at theta -> 0 (JAX's grad-of-where pitfall).  Everything is plain
jnp — works under jit/vmap/pjit, differentiates via autodiff (no custom VJP
needed; the stabilized branches already give correct tangent-space gradients).
"""

import jax
import jax.numpy as jnp

from .quaternion import quat_multiply, quat_conjugate, quat_rotate

_HP = jax.lax.Precision.HIGHEST

_SMALL = 1e-8  # squared-angle cutoff for Taylor branches (fp32-safe)


def se3_identity(shape=(), dtype=jnp.float32):
    """Identity pose(s) of shape ``shape + (7,)``."""
    data = jnp.zeros(tuple(shape) + (7,), dtype=dtype)
    return data.at[..., 6].set(1.0)


def se3_identity_like(pose):
    """Identity pose with the same batch shape as ``pose`` (lietorch's
    ``SE3.IdentityLike``, ``/root/reference/train.py:145``)."""
    return se3_identity(pose.shape[:-1], pose.dtype)


def se3_compose(a, b):
    """Group product a * b on ``(..., 7)`` poses.

    (t_a, q_a) * (t_b, q_b) = (t_a + R(q_a) t_b,  q_a q_b)
    """
    t = a[..., :3] + quat_rotate(a[..., 3:], b[..., :3])
    q = quat_multiply(a[..., 3:], b[..., 3:])
    return jnp.concatenate([t, q], axis=-1)


def se3_inverse(a):
    """Group inverse on ``(..., 7)`` poses: (-R(q)^-1 t, q^-1)."""
    qinv = quat_conjugate(a[..., 3:])
    t = -quat_rotate(qinv, a[..., :3])
    return jnp.concatenate([t, qinv], axis=-1)


def so3_log(q):
    """SO(3) log map: unit quaternion ``(..., 4)`` W-last -> ``(..., 3)``.

    phi = 2 * atan2(|v|, w) / |v| * v, with the Taylor expansion
    2/w * (1 - |v|^2 / (3 w^2)) near |v| -> 0 (Sophus/lietorch formula).
    """
    v = q[..., :3]
    w = q[..., 3:4]
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = n2 < _SMALL
    n = jnp.sqrt(jnp.where(small, 1.0, n2))
    # General branch: 2*atan2(n, w)/n.  atan2 handles w<0 (angle > pi/2... pi).
    general = 2.0 * jnp.arctan2(n, w) / n
    # Taylor: 2/w - 2*n2/(3 w^3); |q|=1 => w ~ +-1 when n is small, but guard
    # the DEAD branch too (w ~ 0 at 180deg rotations would poison the grad).
    ws = jnp.where(small, w, 1.0)
    taylor = 2.0 / ws - 2.0 * n2 / (3.0 * ws ** 3)
    factor = jnp.where(small, taylor, general)
    return factor * v


def so3_exp(phi):
    """SO(3) exp map: ``(..., 3)`` -> unit quaternion ``(..., 4)`` W-last."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta2 < _SMALL
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    half = 0.5 * theta
    # sin(theta/2)/theta, with Taylor 1/2 - theta^2/48
    imag = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    real = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([imag * phi, real], axis=-1)


def _hat(phi):
    """Skew-symmetric matrix of ``(..., 3)`` -> ``(..., 3, 3)``."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zeros = jnp.zeros_like(x)
    m = jnp.stack([zeros, -z, y,
                   z, zeros, -x,
                   -y, x, zeros], axis=-1)
    return m.reshape(phi.shape[:-1] + (3, 3))


def _V_matrix(phi):
    """Left Jacobian V(phi) of SE(3): V = I + a*Phi + b*Phi^2 with
    a = (1-cos t)/t^2, b = (t - sin t)/t^3."""
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta2 < _SMALL
    # safe-x trick: never divide by a (near-)zero theta2 in the dead branch,
    # or grad-of-where propagates NaN.
    t2s = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2s)
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (t2s * theta))
    Phi = _hat(phi)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + a * Phi + b * jnp.matmul(Phi, Phi, precision=_HP)


def _V_inverse(phi):
    """Inverse left Jacobian: V^-1 = I - Phi/2 + c*Phi^2 with
    c = (1 - theta*cos(theta/2)/(2 sin(theta/2))) / theta^2, c -> 1/12."""
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta2 < _SMALL
    t2s = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2s)
    half = 0.5 * theta
    c = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / t2s,
    )
    Phi = _hat(phi)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye - 0.5 * Phi + c * jnp.matmul(Phi, Phi, precision=_HP)


def se3_log(pose):
    """SE(3) log map: ``(..., 7)`` pose -> ``(..., 6) = [tau, phi]``."""
    t = pose[..., :3]
    phi = so3_log(pose[..., 3:])
    tau = jnp.einsum("...ij,...j->...i", _V_inverse(phi), t, precision=_HP)
    return jnp.concatenate([tau, phi], axis=-1)


def se3_exp(xi):
    """SE(3) exp map: ``(..., 6) = [tau, phi]`` -> ``(..., 7)`` pose."""
    tau, phi = xi[..., :3], xi[..., 3:]
    q = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", _V_matrix(phi), tau, precision=_HP)
    return jnp.concatenate([t, q], axis=-1)


def se3_normalize_quat(pose, eps=0.01):
    """Re-normalize the quaternion block with a norm floor.

    Mirrors ``ViTEss.normalize_preds``'s quaternion handling
    (``/root/reference/src/model.py:148-151``): q <- q / max(|q|, eps).
    """
    q = pose[..., 3:]
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, eps)
    return jnp.concatenate([pose[..., :3], q], axis=-1)
