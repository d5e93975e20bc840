"""Unit tests for the pure-JAX Lie-group / quaternion layer.

Cross-checked against scipy.spatial.transform.Rotation (the same library the
reference uses for quaternion conversions) and closed-form identities.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from rel_pose_tpu.geom import (
    quat_multiply, quat_conjugate, quat_rotate, quat_to_matrix,
    matrix_to_quat, rotation_from_viewpoint, geodesic_angle_from_matrices,
    se3_identity, se3_identity_like, se3_compose, se3_inverse,
    se3_log, se3_exp, so3_log, so3_exp, geodesic_loss,
)
from rel_pose_tpu.geom.quaternion import relative_rotation_from_viewpoints
from rel_pose_tpu.geom.epipolar import (
    essential_from_pose, fundamental_from_essential,
    compute_correspond_epilines, epiline_slope_intercept, skew,
)

RNG = np.random.default_rng(0)


def random_quats(n):
    q = R.random(n, random_state=7).as_quat().astype(np.float32)  # xyzw
    return q


def random_poses(n, scale=2.0):
    q = random_quats(n)
    t = (RNG.standard_normal((n, 3)) * scale).astype(np.float32)
    return np.concatenate([t, q], axis=-1)


class TestQuaternion:
    def test_multiply_vs_scipy(self):
        q1, q2 = random_quats(32), random_quats(32)
        ours = np.asarray(quat_multiply(jnp.array(q1), jnp.array(q2)))
        ref = (R.from_quat(q1) * R.from_quat(q2)).as_quat()
        # same rotation up to sign
        dot = np.abs(np.sum(ours * ref, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_rotate_vs_matrix(self):
        q = random_quats(16)
        v = RNG.standard_normal((16, 3)).astype(np.float32)
        ours = np.asarray(quat_rotate(jnp.array(q), jnp.array(v)))
        ref = R.from_quat(q).apply(v)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_quat_matrix_roundtrip(self):
        q = random_quats(64)
        m = quat_to_matrix(jnp.array(q))
        np.testing.assert_allclose(np.asarray(m), R.from_quat(q).as_matrix(),
                                   atol=1e-5)
        q2 = np.asarray(matrix_to_quat(m))
        dot = np.abs(np.sum(q2 * q, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_matrix_to_quat_near_pi(self):
        # 180-degree rotations hit the degenerate trace branch
        for axis in np.eye(3):
            m = R.from_rotvec(np.pi * axis).as_matrix().astype(np.float32)
            q = np.asarray(matrix_to_quat(jnp.array(m)))
            ref = R.from_quat(q).as_matrix()
            np.testing.assert_allclose(ref, m, atol=1e-5)

    def test_conjugate_is_inverse(self):
        q = jnp.array(random_quats(8))
        prod = quat_multiply(q, quat_conjugate(q))
        np.testing.assert_allclose(np.asarray(prod[..., 3]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(prod[..., :3]), 0.0, atol=1e-6)


class TestViewpointRotations:
    def test_against_reference_formula(self):
        # replicate interiornet.py:27-49 with plain numpy
        import math
        x1, y1, x2, y2 = 0.3, -0.7, -0.2, 1.1

        def ref_vp(rx, ry):
            rx, ry = rx, -ry
            c1, s1 = math.cos(rx), math.sin(rx)
            c2, s2 = math.cos(ry), math.sin(ry)
            return np.array([[c2, s1 * s2, c1 * s2],
                             [0, c1, -s1],
                             [-s2, s1 * c2, c1 * c2]])

        expected = ref_vp(x2, y2) @ ref_vp(x1, y1).T
        got = np.asarray(relative_rotation_from_viewpoints(x1, y1, x2, y2))
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_geodesic_angle(self):
        m1 = R.from_rotvec([0.5, 0, 0]).as_matrix().astype(np.float32)
        m2 = R.from_rotvec([0.1, 0, 0]).as_matrix().astype(np.float32)
        ang = np.asarray(geodesic_angle_from_matrices(jnp.array(m1),
                                                      jnp.array(m2)))
        np.testing.assert_allclose(ang, 0.4, atol=1e-5)


class TestSO3:
    def test_log_vs_scipy(self):
        # scipy canonicalizes rotvecs to angle <= pi; our log follows
        # Sophus/lietorch semantics (theta = 2*atan2(|v|, w), which exceeds pi
        # when w < 0).  Compare on w>=0 quaternions where both agree.
        q = random_quats(64)
        q = q * np.where(q[:, 3:4] < 0, -1.0, 1.0)
        ours = np.asarray(so3_log(jnp.array(q)))
        ref = R.from_quat(q).as_rotvec()
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_log_double_cover(self):
        # -q encodes the same rotation; logs differ by 2*pi about the same
        # axis (Sophus convention).
        q = random_quats(16)
        q = q * np.where(q[:, 3:4] < 0, -1.0, 1.0)
        l1 = np.asarray(so3_log(jnp.array(q)))
        l2 = np.asarray(so3_log(jnp.array(-q)))
        ang1 = np.linalg.norm(l1, axis=-1)
        ang2 = np.linalg.norm(l2, axis=-1)
        np.testing.assert_allclose(ang1 + ang2, 2 * np.pi, atol=1e-3)
        cos = np.sum(l1 * l2, axis=-1) / np.maximum(ang1 * ang2, 1e-9)
        np.testing.assert_allclose(cos, -1.0, atol=1e-4)

    def test_exp_log_roundtrip(self):
        phi = (RNG.standard_normal((64, 3)) * 1.5).astype(np.float32)
        back = np.asarray(so3_log(so3_exp(jnp.array(phi))))
        np.testing.assert_allclose(back, phi, atol=1e-4)

    def test_small_angle_stable(self):
        for mag in [0.0, 1e-10, 1e-6, 1e-4]:
            phi = jnp.array([[mag, 0.0, 0.0]], dtype=jnp.float32)
            q = so3_exp(phi)
            assert np.isfinite(np.asarray(q)).all()
            back = so3_log(q)
            np.testing.assert_allclose(np.asarray(back), np.asarray(phi),
                                       atol=1e-6)

    def test_gradients_finite_at_identity(self):
        def f(phi):
            return jnp.sum(so3_log(so3_exp(phi)) ** 2)
        g = jax.grad(f)(jnp.zeros(3))
        assert np.isfinite(np.asarray(g)).all()
        g2 = jax.grad(lambda q: jnp.sum(so3_log(q) ** 2))(
            jnp.array([0.0, 0.0, 0.0, 1.0]))
        assert np.isfinite(np.asarray(g2)).all()


class TestSE3:
    def test_identity_compose(self):
        p = jnp.array(random_poses(8))
        eye = se3_identity_like(p)
        np.testing.assert_allclose(np.asarray(se3_compose(eye, p)),
                                   np.asarray(p), atol=1e-6)
        np.testing.assert_allclose(np.asarray(se3_compose(p, eye)),
                                   np.asarray(p), atol=1e-6)

    def test_inverse(self):
        p = jnp.array(random_poses(16))
        prod = se3_compose(p, se3_inverse(p))
        eye = np.asarray(se3_identity_like(p))
        np.testing.assert_allclose(np.asarray(prod), eye, atol=1e-5)

    def test_compose_vs_matrix(self):
        a, b = random_poses(8), random_poses(8)
        ours = np.asarray(se3_compose(jnp.array(a), jnp.array(b)))
        Ra, Rb = R.from_quat(a[:, 3:]).as_matrix(), R.from_quat(b[:, 3:]).as_matrix()
        t = a[:, :3] + np.einsum("nij,nj->ni", Ra, b[:, :3])
        Rc = np.einsum("nij,njk->nik", Ra, Rb)
        np.testing.assert_allclose(ours[:, :3], t, atol=1e-4)
        np.testing.assert_allclose(
            R.from_quat(ours[:, 3:]).as_matrix(), Rc, atol=1e-4)

    def test_exp_log_roundtrip(self):
        xi = (RNG.standard_normal((64, 6)) * 1.0).astype(np.float32)
        back = np.asarray(se3_log(se3_exp(jnp.array(xi))))
        np.testing.assert_allclose(back, xi, atol=1e-4)

    def test_log_pure_translation(self):
        p = np.zeros((4, 7), dtype=np.float32)
        p[:, 6] = 1.0
        p[:, :3] = RNG.standard_normal((4, 3))
        xi = np.asarray(se3_log(jnp.array(p)))
        np.testing.assert_allclose(xi[:, :3], p[:, :3], atol=1e-6)
        np.testing.assert_allclose(xi[:, 3:], 0.0, atol=1e-6)

    def test_log_grad_finite(self):
        p = jnp.array(random_poses(4))

        def f(p):
            return jnp.sum(se3_log(p) ** 2)

        g = jax.grad(f)(p)
        assert np.isfinite(np.asarray(g)).all()
        g_id = jax.grad(f)(se3_identity((4,)))
        assert np.isfinite(np.asarray(g_id)).all()


class TestGeodesicLoss:
    def test_zero_at_equal(self):
        Ps = jnp.array(random_poses(6).reshape(3, 2, 7))
        tr, rot, metrics = geodesic_loss(Ps, Ps)
        assert float(tr) < 1e-4
        assert float(rot) < 1e-4
        assert "train_geo_loss_tr" in metrics

    def test_known_offset(self):
        # GT: identity pair; pred: pose1 translated by (1,0,0) -> loss_tr is
        # the mean over both directions of |tau| = 1.
        Ps = np.zeros((1, 2, 7), dtype=np.float32)
        Ps[..., 6] = 1.0
        Gs = Ps.copy()
        Gs[0, 1, 0] = 1.0
        tr, rot, _ = geodesic_loss(jnp.array(Ps), jnp.array(Gs))
        np.testing.assert_allclose(float(tr), 1.0, atol=1e-5)
        np.testing.assert_allclose(float(rot), 0.0, atol=1e-5)

    def test_differentiable(self):
        Ps = jnp.array(random_poses(4).reshape(2, 2, 7))
        Gs = jnp.array(random_poses(4).reshape(2, 2, 7))

        def f(g):
            tr, rot, _ = geodesic_loss(Ps, g)
            return 10.0 * tr + 10.0 * rot

        g = jax.grad(f)(Gs)
        assert np.isfinite(np.asarray(g)).all()
        # grad at the optimum (Gs == Ps) must also be finite
        g0 = jax.grad(f)(Ps)
        assert np.isfinite(np.asarray(g0)).all()


class TestEpipolar:
    def test_epipolar_constraint(self):
        # For corresponding points of a rigid scene, x2^T F x1 = 0.
        # Build a synthetic camera pair and verify a projected point lies on
        # its epipolar line.
        pose = np.array([0.5, -0.2, 0.1, *R.from_rotvec([0.1, 0.2, -0.05]).as_quat()],
                        dtype=np.float32)
        K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]],
                     dtype=np.float32)
        E = np.asarray(essential_from_pose(jnp.array(pose)))
        F = np.asarray(fundamental_from_essential(jnp.array(E), jnp.array(K),
                                                  jnp.array(K)))
        # world point -> both images
        Rm = R.from_quat(pose[3:]).as_matrix()
        t = pose[:3]
        Xw = np.array([0.3, 0.1, 4.0])
        x1 = K @ Xw
        x1 = x1 / x1[2]
        X2 = Rm @ Xw + t
        x2 = K @ X2
        x2 = x2 / x2[2]
        resid = x2 @ F @ x1
        assert abs(resid) < 1e-4
        # and the epiline through x1 contains x2
        line = np.asarray(compute_correspond_epilines(
            jnp.array(x1[None]), jnp.array(F)))[0]
        assert abs(line @ x2) < 1e-4
        m, b = epiline_slope_intercept(jnp.array(line))
        np.testing.assert_allclose(float(m) * x2[0] + float(b), x2[1],
                                   atol=1e-3)

    def test_skew(self):
        t = np.array([1.0, 2.0, 3.0], dtype=np.float32)
        v = np.array([0.3, -1.0, 0.5], dtype=np.float32)
        got = np.asarray(skew(jnp.array(t))) @ v
        np.testing.assert_allclose(got, np.cross(t, v), atol=1e-6)
