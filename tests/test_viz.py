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
