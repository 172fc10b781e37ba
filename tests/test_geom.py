"""Property tests for the SO(3)/SE(3) core against scipy oracles."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

import jax
import jax.numpy as jnp

from lidar_slam_arvc_tpu import geom

N = 64


def random_rotations(rng, n=N):
    return ScipyRot.random(n, random_state=np.random.RandomState(7)).as_matrix()


def random_transforms(rng, n=N, scale=10.0):
    R = random_rotations(rng, n)
    t = rng.normal(size=(n, 3)) * scale
    T = np.tile(np.eye(4), (n, 1, 1))
    T[:, :3, :3] = R
    T[:, :3, 3] = t
    return T


class TestQuaternions:
    def test_quat_rot_roundtrip(self, rng):
        R = random_rotations(rng)
        q = geom.rot_to_quat(jnp.asarray(R))
        R2 = geom.quat_to_rot(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_quat_matches_scipy(self, rng):
        R = random_rotations(rng)
        q = np.asarray(geom.rot_to_quat(jnp.asarray(R)))
        # scipy uses xyzw; ours is wxyz. Quaternions are sign-ambiguous.
        q_scipy = ScipyRot.from_matrix(R).as_quat()  # xyzw
        q_scipy_wxyz = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1)
        dot = np.abs(np.sum(q * q_scipy_wxyz, axis=1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_quat_multiply_matches_rot_compose(self, rng):
        Ra = random_rotations(rng)
        Rb = random_rotations(rng)
        qa = geom.rot_to_quat(jnp.asarray(Ra))
        qb = geom.rot_to_quat(jnp.asarray(Rb))
        qab = geom.quat_multiply(qa, qb)
        np.testing.assert_allclose(
            np.asarray(geom.quat_to_rot(qab)), Ra @ Rb, atol=1e-5
        )

    def test_unit_norm(self, rng):
        R = random_rotations(rng)
        q = np.asarray(geom.rot_to_quat(jnp.asarray(R)))
        np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)

    def test_identity(self):
        q = geom.rot_to_quat(jnp.eye(3))
        np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-7)

    def test_near_pi_rotations(self):
        # Rotations by ~pi exercise the dominant-diagonal branches.
        for axis in [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 1, 1]]:
            axis = np.array(axis, dtype=float)
            axis /= np.linalg.norm(axis)
            R = ScipyRot.from_rotvec(axis * (np.pi - 1e-5)).as_matrix()
            q = np.asarray(geom.rot_to_quat(jnp.asarray(R)))
            R2 = np.asarray(geom.quat_to_rot(jnp.asarray(q)))
            np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_slerp_endpoints(self, rng):
        R = random_rotations(rng, 2)
        q1 = geom.rot_to_quat(jnp.asarray(R[0]))
        q2 = geom.rot_to_quat(jnp.asarray(R[1]))
        np.testing.assert_allclose(
            np.asarray(geom.quat_slerp(q1, q2, 0.0)), np.asarray(q1), atol=1e-5
        )
        q_end = np.asarray(geom.quat_slerp(q1, q2, 1.0))
        dot = abs(np.dot(q_end, np.asarray(q2)))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)


class TestEuler:
    def test_euler_rot_roundtrip(self, rng):
        abg = rng.uniform(-np.pi, np.pi, size=(N, 3))
        abg[:, 1] = rng.uniform(-np.pi / 2 + 0.05, np.pi / 2 - 0.05, size=N)
        R = geom.euler_to_rot(jnp.asarray(abg))
        e1, e2 = geom.rot_to_euler_both(R)
        # at least one branch must reproduce the rotation
        R1 = np.asarray(geom.euler_to_rot(e1))
        R2 = np.asarray(geom.euler_to_rot(e2))
        err1 = np.abs(R1 - np.asarray(R)).max(axis=(1, 2))
        err2 = np.abs(R2 - np.asarray(R)).max(axis=(1, 2))
        assert np.minimum(err1, err2).max() < 1e-5

    def test_euler_matches_scipy_convention(self, rng):
        # R = Rx(a) Ry(b) Rz(g) is scipy's intrinsic 'XYZ'.
        abg = np.array([[0.3, -0.4, 1.1]])
        R = np.asarray(geom.euler_to_rot(jnp.asarray(abg)))
        R_scipy = ScipyRot.from_euler("XYZ", abg[0]).as_matrix()
        np.testing.assert_allclose(R[0], R_scipy, atol=1e-6)

    def test_both_branches_valid(self, rng):
        R = random_rotations(rng)
        e1, e2 = geom.rot_to_euler_both(jnp.asarray(R))
        R1 = np.asarray(geom.euler_to_rot(e1))
        R2 = np.asarray(geom.euler_to_rot(e2))
        np.testing.assert_allclose(R1, R, atol=1e-4)
        np.testing.assert_allclose(R2, R, atol=1e-4)


class TestSO3ExpLog:
    def test_roundtrip(self, rng):
        w = rng.normal(size=(N, 3))
        R = geom.so3_exp(jnp.asarray(w))
        R_scipy = ScipyRot.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(np.asarray(R), R_scipy, atol=1e-5)

    def test_log_matches_scipy(self, rng):
        R = random_rotations(rng)
        w = np.asarray(geom.so3_log(jnp.asarray(R)))
        w_scipy = ScipyRot.from_matrix(R).as_rotvec()
        np.testing.assert_allclose(w, w_scipy, atol=1e-4)

    def test_log_small_angle(self):
        w = np.array([[1e-8, -2e-8, 1e-9], [0.0, 0.0, 0.0]])
        R = geom.so3_exp(jnp.asarray(w))
        w2 = np.asarray(geom.so3_log(R))
        np.testing.assert_allclose(w2, w, atol=1e-9)

    def test_log_near_pi(self):
        for axis in [[1, 0, 0], [0.6, 0.8, 0], [1, 1, 1]]:
            axis = np.asarray(axis, dtype=float)
            axis /= np.linalg.norm(axis)
            for angle in [np.pi - 1e-4, np.pi - 1e-6]:
                R = ScipyRot.from_rotvec(axis * angle).as_matrix()
                w = np.asarray(geom.so3_log(jnp.asarray(R)))
                np.testing.assert_allclose(
                    np.abs(w @ axis), angle, atol=1e-3
                )


class TestSE3:
    def test_compose_inverse(self, rng):
        T = random_transforms(rng)
        I = np.asarray(geom.compose(T, geom.inverse(jnp.asarray(T))))
        np.testing.assert_allclose(I, np.tile(np.eye(4), (N, 1, 1)), atol=1e-4)

    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(N, 6))
        T = geom.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(geom.se3_log(T))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)

    def test_exp_zero(self):
        T = np.asarray(geom.se3_exp(jnp.zeros(6)))
        np.testing.assert_allclose(T, np.eye(4), atol=1e-7)

    def test_relative_global_roundtrip(self, rng):
        T = random_transforms(rng, n=32)
        rel = geom.relative_transforms(jnp.asarray(T))
        T2 = np.asarray(geom.global_transforms(rel, T0=jnp.asarray(T[0])))
        np.testing.assert_allclose(T2, T, atol=1e-3)

    def test_global_transforms_matches_loop(self, rng):
        # oracle: the reference's sequential left-fold
        # (homogeneousmatrix.py:184-205)
        T0 = random_transforms(rng, 1)[0]
        rel = random_transforms(rng, 16, scale=1.0)
        expected = [T0]
        for i in range(16):
            expected.append(expected[-1] @ rel[i])
        expected = np.stack(expected)
        got = np.asarray(geom.global_transforms(jnp.asarray(rel), T0=jnp.asarray(T0)))
        np.testing.assert_allclose(got, expected, atol=1e-3)

    def test_transform_points(self, rng):
        T = random_transforms(rng, 4)
        p = rng.normal(size=(4, 100, 3))
        got = np.asarray(geom.transform_points(jnp.asarray(T), jnp.asarray(p)))
        expected = np.einsum("bij,bnj->bni", T[:, :3, :3], p) + T[:, None, :3, 3]
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_t2v(self, rng):
        pos = np.array([1.0, 2.0, 3.0])
        abg = np.array([0.1, -0.2, 0.3])
        T = geom.transform_from_euler(jnp.asarray(pos), jnp.asarray(abg))
        v = np.asarray(geom.t2v(T))
        np.testing.assert_allclose(v[:3], pos, atol=1e-6)
        np.testing.assert_allclose(v[3:], abg, atol=1e-5)

    def test_pose_columns_roundtrip(self, rng):
        T = random_transforms(rng, 16)
        xyz, q = geom.pose_columns_from_transforms(jnp.asarray(T))
        T2 = np.asarray(geom.transforms_from_pose_columns(xyz, q))
        np.testing.assert_allclose(T2, T, atol=1e-4)

    def test_jit_and_vmap(self, rng):
        # everything must be jittable
        T = jnp.asarray(random_transforms(rng, 8))
        f = jax.jit(lambda T: geom.se3_log(geom.compose(T, geom.inverse(T[0]))))
        out = f(T)
        assert out.shape == (8, 6)


class TestHostMathParity:
    """Numpy host mirrors must agree with the jax geom implementations."""

    def test_quat_rot_mirror(self, rng):
        from lidar_slam_arvc_tpu.geom import hostmath as hm
        R = random_rotations(rng)
        q_np = hm.rot_to_quat_np(R)
        q_jx = np.asarray(geom.rot_to_quat(jnp.asarray(R)))
        dot = np.abs(np.sum(q_np * q_jx, axis=1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)
        np.testing.assert_allclose(hm.quat_to_rot_np(q_np), R, atol=1e-9)

    def test_pose_columns_mirror(self, rng):
        from lidar_slam_arvc_tpu.geom import hostmath as hm
        T = random_transforms(rng, 8)
        xyz, q = hm.pose_columns_from_transforms_np(T)
        T2 = hm.transforms_from_pose_columns_np(xyz, q)
        np.testing.assert_allclose(T2, T, atol=1e-9)

    def test_yaw_mirror(self, rng):
        from lidar_slam_arvc_tpu.geom import hostmath as hm
        abg = rng.uniform(-1.2, 1.2, size=(32, 3))
        R = np.asarray(geom.euler_to_rot(jnp.asarray(abg)))
        q = hm.rot_to_quat_np(R)
        np.testing.assert_allclose(hm.quat_to_yaw_np(q), abg[:, 2], atol=1e-5)
