"""FPFH + RANSAC global registration tests (no initial guess)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidar_slam_arvc_tpu import cloud as cl
from lidar_slam_arvc_tpu.cloud.fpfh import compute_fpfh
from lidar_slam_arvc_tpu.registration import ICPParams
from lidar_slam_arvc_tpu.registration.global_reg import (
    GlobalRegParams, global_registration, ransac_feature_registration,
)
from lidar_slam_arvc_tpu.utils import synthetic

CAP = 4096


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(11)
    # boxes give FPFH discriminative corner/edge geometry; bare cylinders
    # are rotationally symmetric and all look alike to local descriptors
    # dense scans: FPFH histograms need tens of ball neighbors per point,
    # like real LiDAR (sparse scans make 33-bin histograms pure noise)
    world = synthetic.make_world(rng, extent=11.0, n_ground=14000,
                                 n_pillars=6, pillar_pts=600,
                                 n_boxes=10, box_pts=2000)
    T_i = synthetic._yaw_T(0.0, 0.0, 0.0)
    # large offset + rotation: odometry-free regime
    T_j = synthetic._yaw_T(2.0, 1.0, 0.6)
    scan_i = synthetic.render_scan(world, T_i, rng, max_range=10.0,
                                   max_points=7000)
    scan_j = synthetic.render_scan(world, T_j, rng, max_range=10.0,
                                   max_points=7000)
    T_ij_gt = np.linalg.inv(T_i) @ T_j
    return scan_i, scan_j, T_ij_gt


def prep(scan):
    c = cl.from_numpy(scan, CAP)
    c = cl.crop_radius_height(c, 0.5, 35.0, -1.0, 50.0)
    c = cl.voxel_downsample(c, 0.2)
    return cl.estimate_normals(c, radius=0.4)


class TestFPFH:
    def test_shapes_and_masking(self, scene):
        c = prep(scene[0])
        f = compute_fpfh(c, radius=1.0, query_block=256, tgt_block=256)
        assert f.shape == (CAP, 33)
        f_np = np.asarray(f)
        m = np.asarray(c.mask)
        assert np.all(f_np[~m] == 0)
        # each 11-bin block sums to ~100 for valid points with neighbors
        sums = f_np[m][:, :11].sum(axis=1)
        assert np.median(np.abs(sums - 100.0)) < 1.0

    def test_descriptor_invariance_under_rigid_motion(self, scene):
        # same cloud rigidly moved -> (near-)identical descriptors
        c = prep(scene[0])
        T = synthetic._yaw_T(3.0, -2.0, 0.7)
        R = np.asarray(T[:3, :3])
        moved_pts = np.asarray(c.points) @ R.T + T[:3, 3]
        # carry the normals through the rigid motion (recomputing would
        # re-orient them toward the unmoved origin)
        moved_n = np.asarray(c.normals) @ R.T
        c2 = cl.Cloud(jnp.asarray(moved_pts.astype(np.float32)), c.mask,
                      jnp.asarray(moved_n.astype(np.float32)))
        f1 = np.asarray(compute_fpfh(c, 1.0, query_block=256, tgt_block=256))
        f2 = np.asarray(compute_fpfh(c2, 1.0, query_block=256, tgt_block=256))
        m = np.asarray(c.mask)
        diff = np.abs(f1[m] - f2[m]).mean()
        assert diff < 5.0, diff  # small vs the 0..100 bin scale


def split_nonground(c):
    plane = cl.ransac_ground_plane(c, jax.random.PRNGKey(5), seed_height=-0.5)
    _, ng = cl.split_by_plane(c, plane, 0.4)
    return ng


class TestGlobalRegistration:
    def test_recovers_large_transform(self, scene):
        scan_i, scan_j, T_ij_gt = scene
        ci = prep(scan_i)
        cj = prep(scan_j)
        params = GlobalRegParams(
            fpfh_radius=1.0, num_hypotheses=2048,
            icp=ICPParams(max_correspondence_distance=5.0,
                          max_iterations=25, src_block=256, tgt_block=256))
        # FPFH on the non-ground clouds, like the reference
        # (keyframe.py:318-320)
        res = global_registration(cj, ci, jax.random.PRNGKey(0), params,
                                  src_nonground=split_nonground(cj),
                                  tgt_nonground=split_nonground(ci))
        est = np.asarray(res.transform, dtype=np.float64)
        dpos = np.linalg.norm(est[:3, 3] - T_ij_gt[:3, 3])
        dR = np.linalg.inv(est[:3, :3]) @ T_ij_gt[:3, :3]
        drot = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert dpos < 0.25, f"position error {dpos}"
        assert drot < 0.05, f"rotation error {drot}"

    def test_coarse_stage_alone(self, scene):
        scan_i, scan_j, T_ij_gt = scene
        ci = split_nonground(prep(scan_i))
        cj = split_nonground(prep(scan_j))
        fi = compute_fpfh(ci, 1.0, query_block=256, tgt_block=256)
        fj = compute_fpfh(cj, 1.0, query_block=256, tgt_block=256)
        params = GlobalRegParams(fpfh_radius=1.0, num_hypotheses=2048)
        T0, score = ransac_feature_registration(
            cj, fj, ci, fi, jax.random.PRNGKey(1), params)
        assert int(score) > 20
        dpos = np.linalg.norm(np.asarray(T0)[:3, 3] - T_ij_gt[:3, 3])
        assert dpos < 1.0, f"coarse position error {dpos}"
