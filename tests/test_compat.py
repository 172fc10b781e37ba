"""artelib-compatible class layer (compat.py) vs scipy/geom oracles."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as SR

from lidar_slam_arvc_tpu import compat
from lidar_slam_arvc_tpu.compat import (
    Euler, HomogeneousMatrix, Quaternion, RotationMatrix, Vector,
    Rx, Ry, Rz, R2,
)


def _random_R(rng):
    return SR.from_rotvec(rng.normal(size=3)).as_matrix()


class TestValueTypes:
    def test_quaternion_wxyz_roundtrip(self, rng):
        R = _random_R(rng)
        q = RotationMatrix(R).Q()
        # wxyz order: scipy uses xyzw
        q_scipy = SR.from_matrix(R).as_quat()  # xyzw
        got = q.toarray()
        if np.sign(got[0]) != np.sign(q_scipy[3]) and q_scipy[3] != 0:
            q_scipy = -q_scipy
        np.testing.assert_allclose(got, np.r_[q_scipy[3], q_scipy[:3]],
                                   atol=1e-9)
        np.testing.assert_allclose(q.R().toarray(), R, atol=1e-9)

    def test_quaternion_product_matches_rotation_compose(self, rng):
        Ra, Rb = _random_R(rng), _random_R(rng)
        qa, qb = RotationMatrix(Ra).Q(), RotationMatrix(Rb).Q()
        np.testing.assert_allclose((qa * qb).R().toarray(), Ra @ Rb,
                                   atol=1e-9)
        # conjugate = inverse for unit quaternions
        np.testing.assert_allclose((qa * qa.qconj()).toarray(),
                                   [1, 0, 0, 0], atol=1e-9)

    def test_euler_both_branches_reconstruct(self, rng):
        R = _random_R(rng)
        e1, e2 = RotationMatrix(R).euler()
        np.testing.assert_allclose(Euler(e1).R().toarray(), R, atol=1e-9)
        np.testing.assert_allclose(Euler(e2).R().toarray(), R, atol=1e-9)

    def test_euler_gimbal_lock(self):
        R = Ry(np.pi / 2).toarray()
        e1, e2 = RotationMatrix(R).euler()
        np.testing.assert_allclose(Euler(e1).R().toarray(), R, atol=1e-6)
        np.testing.assert_allclose(Euler(e2).R().toarray(), R, atol=1e-6)

    def test_fundamental_rotations(self):
        th = 0.3
        np.testing.assert_allclose(
            Rx(th).toarray(), SR.from_euler("x", th).as_matrix(), atol=1e-12)
        np.testing.assert_allclose(
            Ry(th).toarray(), SR.from_euler("y", th).as_matrix(), atol=1e-12)
        np.testing.assert_allclose(
            Rz(th).toarray(), SR.from_euler("z", th).as_matrix(), atol=1e-12)
        np.testing.assert_allclose(R2(th).toarray()[:, 0],
                                   [np.cos(th), np.sin(th)], atol=1e-12)

    def test_vector_algebra(self):
        u, v = Vector([1.0, 0, 0]), Vector([0, 1.0, 0])
        assert u * v == 0.0
        np.testing.assert_allclose(u.cross(v).toarray(), [0, 0, 1])
        np.testing.assert_allclose((u + v).toarray(), [1, 1, 0])


class TestHomogeneousMatrix:
    def test_constructors_agree(self, rng):
        R = _random_R(rng)
        pos = rng.normal(size=3)
        hm_R = HomogeneousMatrix(pos, RotationMatrix(R))
        hm_q = HomogeneousMatrix(pos, RotationMatrix(R).Q())
        e1, _ = RotationMatrix(R).euler()
        hm_e = HomogeneousMatrix(pos, e1)
        hm_l = HomogeneousMatrix(list(pos), list(e1.abg))
        for hm in (hm_q, hm_e, hm_l):
            np.testing.assert_allclose(hm.toarray(), hm_R.toarray(),
                                       atol=1e-9)

    def test_compose_inverse(self, rng):
        Ta = HomogeneousMatrix(rng.normal(size=3),
                               RotationMatrix(_random_R(rng)))
        Tb = HomogeneousMatrix(rng.normal(size=3),
                               RotationMatrix(_random_R(rng)))
        np.testing.assert_allclose((Ta * Tb).toarray(),
                                   Ta.toarray() @ Tb.toarray(), atol=1e-12)
        np.testing.assert_allclose((Ta * Ta.inv()).toarray(), np.eye(4),
                                   atol=1e-12)
        v = Vector([1.0, 2.0, 3.0, 1.0])
        np.testing.assert_allclose((Ta * v).toarray(),
                                   Ta.toarray() @ v.toarray(), atol=1e-12)

    def test_t2v(self, rng):
        T = HomogeneousMatrix([1.0, 2.0, 0.0], Rz(0.5))
        np.testing.assert_allclose(T.t2v(), [1, 2, 0.5], atol=1e-12)
        v6 = T.t2v(n=3)
        assert v6.shape == (6,)
        np.testing.assert_allclose(v6[:3], [1, 2, 0], atol=1e-12)
        np.testing.assert_allclose(v6[5], 0.5, atol=1e-9)

    def test_pos_getitem(self):
        T = HomogeneousMatrix([1.0, 2.0, 3.0], RotationMatrix(np.eye(3)))
        np.testing.assert_allclose(T.pos(), [1, 2, 3])
        assert T[(0, 3)] == 1.0


class TestTrajectoryAlgebra:
    """Free functions (reference homogeneousmatrix.py:147-212) and the
    bridge to the framework's stacked (N,4,4) form."""

    def test_relative_global_roundtrip(self, rng):
        import pandas as pd
        n = 10
        Ts = [HomogeneousMatrix(rng.normal(size=3),
                                RotationMatrix(_random_R(rng)))
              for _ in range(n)]
        rel = compat.compute_relative_transformations(Ts)
        back = compat.compute_global_transformations(rel, Ts[0])
        for a, b in zip(back, Ts):
            np.testing.assert_allclose(a.toarray(), b.toarray(), atol=1e-9)

    def test_compute_homogeneous_transforms_wxyz(self, rng):
        import pandas as pd
        R = _random_R(rng)
        q = RotationMatrix(R).Q().toarray()  # wxyz
        df = pd.DataFrame({"x": [1.0], "y": [2.0], "z": [3.0],
                           "qw": [q[0]], "qx": [q[1]], "qy": [q[2]],
                           "qz": [q[3]]})
        (T,) = compat.compute_homogeneous_transforms(df)
        np.testing.assert_allclose(T.pos(), [1, 2, 3])
        np.testing.assert_allclose(T.R().toarray(), R, atol=1e-9)

    def test_stack_unstack_bridge(self, rng):
        Ts = [HomogeneousMatrix(rng.normal(size=3),
                                RotationMatrix(_random_R(rng)))
              for _ in range(4)]
        arr = compat.stack(Ts)
        assert arr.shape == (4, 4, 4)
        back = compat.unstack(arr)
        np.testing.assert_allclose(back[2].toarray(), Ts[2].toarray())

    def test_matches_geom_folds(self, rng):
        """compat list algebra == geom stacked-tensor algebra."""
        from lidar_slam_arvc_tpu import geom
        import jax.numpy as jnp
        Ts = [HomogeneousMatrix(rng.normal(size=3),
                                RotationMatrix(_random_R(rng)))
              for _ in range(6)]
        arr = compat.stack(Ts).astype(np.float32)
        rel_geom = np.asarray(geom.relative_transforms(jnp.asarray(arr)))
        rel_compat = compat.stack(
            compat.compute_relative_transformations(Ts))
        np.testing.assert_allclose(rel_geom, rel_compat, atol=1e-4)


class TestSerialRobot:
    """DH kinematics shim (reference artelib/seriallink.py)."""

    def test_planar_rr_arm(self):
        # two revolute links in the XY plane: analytic forward kinematics
        r = compat.SerialRobot(2, np.eye(4))
        r.append(th=0.0, d=0.0, a=1.0, alpha=0.0)
        r.append(th=0.0, d=0.0, a=0.5, alpha=0.0)
        q = np.array([np.pi / 4, np.pi / 4])
        T = r.directkinematics(q)
        x = np.cos(q[0]) + 0.5 * np.cos(q[0] + q[1])
        y = np.sin(q[0]) + 0.5 * np.sin(q[0] + q[1])
        np.testing.assert_allclose(T.pos(), [x, y, 0.0], atol=1e-12)

    def test_prismatic_link(self):
        r = compat.SerialRobot(1, np.eye(4))
        r.append(th=0.0, d=0.2, a=0.0, alpha=0.0, link_type="P")
        T = r.directkinematics(np.array([0.3]))
        np.testing.assert_allclose(T.pos(), [0, 0, 0.5], atol=1e-12)
        assert r.get_link_type(0) == "P"

    def test_dh_equals_elementary_composition(self, rng):
        # A(theta,d,a,alpha) == Rz(theta)*Tz(d)*Tx(a)*Rx(alpha)
        th, d, a, al = rng.uniform(-np.pi, np.pi, 4)
        A = compat.SerialLink(th, d, a, al).dh(0.0).toarray()
        ref = (HomogeneousMatrix([0, 0, 0], Rz(th))
               * HomogeneousMatrix([0, 0, d], RotationMatrix(np.eye(3)))
               * HomogeneousMatrix([a, 0, 0], RotationMatrix(np.eye(3)))
               * HomogeneousMatrix([0, 0, 0], Rx(al))).toarray()
        np.testing.assert_allclose(A, ref, atol=1e-12)
