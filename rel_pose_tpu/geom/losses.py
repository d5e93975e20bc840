"""Geodesic SE(3) training loss.

TPU-native re-implementation of the reference loss
(``/root/reference/src/geom/losses.py:3-21``): with index pairs ii=[0,1],
jj=[1,0], compute both-direction relative poses dP = P_jj * P_ii^-1 for the
ground truth and dG for the prediction, residual d = log(dG * dP^-1), split
into translation/rotation tangent halves, and take mean norms.

Pure function of two ``(B, 2, 7)`` pose arrays — differentiable end to end
through the quaternion-parameterized log/compose/inverse in ``geom.lie``.
"""

import jax.numpy as jnp

from .lie import se3_compose, se3_inverse, se3_log


def _safe_norm(x, axis=-1):
    """L2 norm with a zero (sub)gradient at x = 0 instead of NaN — the
    residual hits exactly zero when predictions equal ground truth."""
    n2 = jnp.sum(x * x, axis=axis)
    zero = n2 < 1e-24
    return jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, n2)))


def geodesic_loss(Ps, Gs, train_val="train"):
    """Args:
      Ps: ground-truth poses ``(B, 2, 7)`` (pose 0 = identity, pose 1 = rel).
      Gs: predicted poses ``(B, 2, 7)``.
      train_val: metric-name prefix ('train' or 'val').

    Returns:
      (loss_tr, loss_rot, metrics) — scalar translation / rotation geodesic
      losses and a metrics dict keyed ``{train_val}_geo_loss_{tr,rot}``
      holding the same scalars (as jnp scalars; callers .item() them
      host-side, mirroring ``losses.py:16-19``).
    """
    ii = jnp.array([0, 1])
    jj = jnp.array([1, 0])

    dP = se3_compose(Ps[:, jj], se3_inverse(Ps[:, ii]))
    dG = se3_compose(Gs[:, jj], se3_inverse(Gs[:, ii]))
    d = se3_log(se3_compose(dG, se3_inverse(dP)))

    tau, phi = d[..., :3], d[..., 3:]
    loss_tr = _safe_norm(tau).mean()
    loss_rot = _safe_norm(phi).mean()

    metrics = {
        train_val + "_geo_loss_tr": loss_tr,
        train_val + "_geo_loss_rot": loss_rot,
    }
    return loss_tr, loss_rot, metrics
