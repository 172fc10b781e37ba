"""Viewer/converter/map-export tests."""

import numpy as np
import pytest

from lidar_slam_arvc_tpu.viz.mapping import (
    build_map, read_ply, write_ply, _voxel_downsample_np,
)


class TestPLY:
    def test_roundtrip_binary(self, tmp_path, rng):
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        fn = str(tmp_path / "a.ply")
        write_ply(fn, pts, binary=True)
        np.testing.assert_array_equal(read_ply(fn), pts)

    def test_roundtrip_ascii(self, tmp_path, rng):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        fn = str(tmp_path / "a.ply")
        write_ply(fn, pts, binary=False)
        np.testing.assert_allclose(read_ply(fn), pts, atol=1e-5)


class TestMap:
    def test_build_map_transforms_scans(self, tmp_path, rng):
        from lidar_slam_arvc_tpu.io.pcd import write_pcd
        import pandas as pd
        d = str(tmp_path)
        times = np.array([100, 200], dtype=np.int64)
        # scan = single point at x=1 in sensor frame
        for t in times:
            write_pcd(f"{d}/robot0/lidar/data/{t}.pcd",
                      np.array([[1.0, 0, 0]], dtype=np.float32))
        T = np.tile(np.eye(4), (2, 1, 1))
        T[1, 0, 3] = 5.0
        cloud = build_map(d, T, times, keyframe_sampling=1, voxel_size=None)
        got = np.sort(cloud[:, 0])
        np.testing.assert_allclose(got, [1.0, 6.0], atol=1e-5)

    def test_voxel_downsample_np(self, rng):
        pts = rng.uniform(0, 4, size=(500, 3)).astype(np.float32)
        out = _voxel_downsample_np(pts, 1.0)
        assert len(out) < len(pts)


class TestViewerEndToEnd:
    def test_view_on_minimal_dataset(self, tmp_path):
        from lidar_slam_arvc_tpu.io import EurocDataset
        from lidar_slam_arvc_tpu.io.pcd import write_pcd
        from lidar_slam_arvc_tpu.viz.viewer import view_dataset
        import pandas as pd
        d = str(tmp_path)
        times = np.array([100, 200, 300], dtype=np.int64)
        rng = np.random.default_rng(0)
        for t in times:
            write_pcd(f"{d}/robot0/lidar/data/{t}.pcd",
                      rng.normal(size=(100, 3)).astype(np.float32) * 5)
        pd.DataFrame({"#timestamp [ns]": times}).to_csv(
            f"{d}/robot0/lidar/data.csv", index=False)
        euroc = EurocDataset(d)
        T = np.tile(np.eye(4), (3, 1, 1))
        T[:, 0, 3] = [0, 1, 2]
        euroc.save_transforms_as_csv(
            times, T, "/robot0/scanmatcher/scanmatcher_global.csv")
        out = view_dataset(d, keyframe_sampling=1, voxel_size=None)
        assert out["source"] == "scanmatcher"
        assert out["map_points"] > 0
        import os
        assert os.path.exists(f"{d}/robot0/viz/trajectory.png")
        assert os.path.exists(f"{d}/robot0/viz/map.ply")


class TestDiagnostics:
    """viewers/ parity: timestamps, raw data, solution comparison."""

    @pytest.fixture(scope="class")
    def diag_dataset(self, tmp_path_factory):
        from lidar_slam_arvc_tpu.utils import synthetic
        d = str(tmp_path_factory.mktemp("diag"))
        info = synthetic.make_dataset(d, n_scans=8, seed=4, radius=6.0,
                                      scan_points=500)
        # fabricate a "solution" = ground truth for the diagnostics to read
        from lidar_slam_arvc_tpu.io import EurocDataset
        EurocDataset(d).save_transforms_as_csv(
            info["times"], info["T_gt"],
            "/robot0/SLAM/solution_graphslam.csv")
        return d, info

    def test_check_timestamps(self, diag_dataset):
        from lidar_slam_arvc_tpu.viz.diagnostics import check_timestamps
        d, info = diag_dataset
        rep = check_timestamps(d)
        assert rep["lidar"]["count"] == 8
        assert abs(rep["lidar"]["rate_hz"] - 1.0) < 1e-6
        assert rep["odom"]["count"] == 32
        assert rep["odometry_distance_m"] > 10

    def test_view_solutions(self, diag_dataset):
        from lidar_slam_arvc_tpu.viz.diagnostics import view_solutions
        d, info = diag_dataset
        rep = view_solutions(d)
        assert rep["poses"] == 8
        # gt solution vs gps (0.05 m noise): end point error small
        assert rep["end_point_error_m"] < 0.5
        import os
        assert os.path.exists(f"{d}/robot0/viz/solution_vs_gps.png")

    def test_compare_solutions(self, diag_dataset):
        from lidar_slam_arvc_tpu.viz.diagnostics import compare_solutions
        d, info = diag_dataset
        rep = compare_solutions(d)
        assert rep["steps"] == 7
        assert rep["delta_error_mean_m"] < 0.3

    def test_view_raw_data(self, diag_dataset):
        from lidar_slam_arvc_tpu.viz.diagnostics import view_raw_data
        d, info = diag_dataset
        rep = view_raw_data(d)
        assert rep["odom_rows"] == 32 and rep["gps_rows"] == 8


class TestProfiling:
    def test_stage_timer(self):
        import time
        from lidar_slam_arvc_tpu.utils.profiling import StageTimer
        t = StageTimer()
        with t.stage("icp", items=10):
            time.sleep(0.01)
        rep = t.report()
        assert rep["icp"]["items"] == 10
        assert rep["icp"]["seconds"] >= 0.01
        assert t.rate("icp") > 0


class TestRegistrationPlot:
    def test_plot_registration(self, tmp_path, rng):
        from lidar_slam_arvc_tpu.viz import plot_registration
        src = rng.normal(size=(100, 3))
        tgt = rng.normal(size=(120, 3))
        fn = str(tmp_path / "reg.png")
        plot_registration(src, tgt, np.eye(4), fn)
        import os
        assert os.path.getsize(fn) > 1000
