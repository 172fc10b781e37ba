"""Viewer/converter/map-export tests."""

import numpy as np
import pytest

from lidar_slam_arvc_tpu.viz.mapping import (
    alpha_shape_mesh, build_map, read_ply, write_ply, _voxel_downsample_np,
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


class TestAlphaShape:
    """alpha_shape_mesh vs the reference's Open3D alpha shape
    (keyframe.py:53-59, run_converter.py:185)."""

    def _cube_volume(self, rng, n=400):
        return rng.uniform(0.0, 1.0, size=(n, 3))

    def test_large_alpha_gives_convex_hull_surface(self, rng):
        from scipy.spatial import ConvexHull
        pts = self._cube_volume(rng)
        # alpha -> inf keeps every tetrahedron (incl. slivers with huge
        # circumradius), so the boundary is exactly the convex hull
        verts, tris = alpha_shape_mesh(pts, alpha=1e12)
        # every tetrahedron kept -> boundary is the convex hull surface:
        # all boundary vertices are hull vertices
        hull = ConvexHull(pts)
        np.testing.assert_allclose(
            np.sort(verts.sum(1)), np.sort(pts[hull.vertices].sum(1)),
            rtol=1e-5)
        # closed surface of sphere topology: every edge shared by exactly
        # two triangles and V - E + F == 2
        edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]],
                                tris[:, [0, 2]]])
        edges = np.sort(edges, axis=1)
        uniq_e, counts = np.unique(edges, axis=0, return_counts=True)
        assert np.all(counts == 2)
        assert len(verts) - len(uniq_e) + len(tris) == 2

    def test_small_alpha_empty(self, rng):
        pts = self._cube_volume(rng)
        verts, tris = alpha_shape_mesh(pts, alpha=1e-6)
        assert len(tris) == 0

    def test_alpha_separates_two_clusters(self, rng):
        # two well-separated blobs: moderate alpha must not bridge them,
        # so the surface splits into >=2 connected components
        a = rng.normal(scale=0.1, size=(200, 3))
        b = rng.normal(scale=0.1, size=(200, 3)) + np.array([5.0, 0, 0])
        verts, tris = alpha_shape_mesh(np.concatenate([a, b]), alpha=0.5)
        assert len(tris) > 0
        x = verts[tris[:, 0], 0]
        assert (x < 2.5).any() and (x > 2.5).any()
        # no triangle spans the gap
        tx = verts[tris, 0]
        assert not np.any((tx.min(1) < 2.0) & (tx.max(1) > 3.0))

    def test_mesh_ply_roundtrip_vertices(self, tmp_path, rng):
        pts = self._cube_volume(rng, n=100)
        verts, tris = alpha_shape_mesh(pts, alpha=10.0)
        path = str(tmp_path / "mesh.ply")
        write_ply(path, verts, faces=tris)
        back = read_ply(path)
        np.testing.assert_allclose(back, verts, rtol=1e-6)

    def test_converter_mesh_mode(self, tmp_path):
        from lidar_slam_arvc_tpu.utils import synthetic
        from lidar_slam_arvc_tpu.viz.converter import convert_dataset
        d = str(tmp_path / "ds")
        synthetic.make_dataset(d, n_scans=3, scan_points=800)
        n = convert_dataset(d, mesh=True, alpha=5.0)
        assert n == 3
        import glob
        files = glob.glob(f"{d}/robot0/lidar/dataply/*.ply")
        assert len(files) == 3
        with open(files[0], "rb") as f:
            head = f.read(400).decode("ascii", "ignore")
        assert "element face" in head


class TestGpsOsmPlot:
    def test_offline_fallback(self, tmp_path):
        import pandas as pd
        from lidar_slam_arvc_tpu.viz import plot_gps_osm
        df = pd.DataFrame({
            "longitude": np.linspace(-0.52, -0.51, 20),
            "latitude": np.linspace(38.27, 38.28, 20),
        })
        out = tmp_path / "osm.png"
        tiles = plot_gps_osm(df, str(out))
        assert out.exists() and out.stat().st_size > 1000
        assert tiles in (True, False)  # tiles need network; fallback is fine


class TestPlottoolsParity:
    """Headless equivalents of tools/plottools.py helpers."""

    def test_haversine(self):
        from lidar_slam_arvc_tpu.viz.plots import compute_distance
        # Madrid -> Barcelona great-circle is ~505 km
        d = compute_distance(40.4168, -3.7038, 41.3874, 2.1686)
        assert 490e3 < float(d) < 520e3
        # vectorized + zero distance
        d2 = compute_distance([40.0, 40.0], [0.0, 0.0], [40.0, 41.0], [0.0, 0.0])
        assert d2[0] == 0.0 and 110e3 < d2[1] < 112e3

    def test_gps_utm_xyz_xy_quaternion_plots(self, tmp_path, rng):
        import pandas as pd
        from lidar_slam_arvc_tpu.viz import plots
        n = 25
        ts = np.arange(n) * int(1e8) + int(1e18)
        df_gps = pd.DataFrame({
            "#timestamp [ns]": ts,
            "latitude": 40.0 + 1e-4 * np.arange(n),
            "longitude": -3.0 + 1e-4 * np.arange(n),
            "covariance_d1": np.full(n, 2.5),
        })
        df_utm = pd.DataFrame({
            "#timestamp [ns]": ts, "x": np.arange(n, dtype=float),
            "y": np.sin(np.arange(n)), "z": np.zeros(n),
            "covariance_d1": np.full(n, 2.5),
        })
        q = rng.normal(size=(n, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        df_q = pd.DataFrame({
            "#timestamp [ns]": ts, "qw": q[:, 0], "qx": q[:, 1],
            "qy": q[:, 2], "qz": q[:, 3],
        })
        plots.plot_gps_points(df_gps, str(tmp_path / "gps.png"),
                              annotate_index=True, annotate_error=True)
        plots.plot_utm_points(df_utm, str(tmp_path / "utm.png"),
                              annotate_index=True, annotate_error=True)
        plots.plot_xyz_data(df_utm, str(tmp_path / "xyz.png"),
                            annotate_time=True)
        plots.plot_xy_data(df_utm, str(tmp_path / "xy.png"),
                           annotate_index=True, annotate_time=True)
        plots.plot_quaternion_data(df_q, str(tmp_path / "quat.png"),
                                   annotate_time=True)
        for name in ("gps", "utm", "xyz", "xy", "quat"):
            assert (tmp_path / f"{name}.png").stat().st_size > 1000
