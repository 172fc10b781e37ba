"""Sharded keyframe store: registration over a mesh-sharded scan stack
must match the replicated store exactly (SURVEY.md §2.3 row 2)."""

import numpy as np
import pytest

import jax

from lidar_slam_arvc_tpu.keyframes import KeyframeStore
from lidar_slam_arvc_tpu.parallel import data_mesh
from lidar_slam_arvc_tpu.utils import synthetic
from lidar_slam_arvc_tpu.utils.config import IcpConfig


@pytest.fixture(scope="module")
def stores(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("kf"))
    info = synthetic.make_dataset(
        d, n_scans=10, seed=4, radius=6.0, scan_points=1500,
        scanmatcher_params={"voxel_size": 0.25, "delta_time": 1.0})
    cfg = IcpConfig(raw_capacity=2048, capacity=1024, max_iterations=8)
    plain = KeyframeStore(d, info["times"], voxel_size=0.25,
                          cfg=cfg).load_and_preprocess()
    shard = KeyframeStore(d, info["times"], voxel_size=0.25,
                          cfg=cfg).load_and_preprocess()
    shard.shard(data_mesh(8))
    return plain, shard, info


class TestShardedStore:
    def test_padding_and_placement(self, stores):
        plain, shard, info = stores
        assert not plain.sharded and shard.sharded
        # 10 scans padded to 16 (mesh multiple); each device holds 2 rows
        assert shard.points.shape[0] == 16
        assert len(shard.points.sharding.device_set) == 8

    def test_registration_matches_replicated(self, stores):
        plain, shard, info = stores
        pairs = np.array([[0, 1], [3, 7], [8, 2], [5, 9]])
        seeds = np.stack([np.linalg.inv(info["T_gt"][i]) @ info["T_gt"][j]
                          for i, j in pairs]).astype(np.float32)
        T_plain = plain.compute_transformations_batch(pairs, seeds)
        T_shard = shard.compute_transformations_batch(pairs, seeds)
        np.testing.assert_allclose(T_shard, T_plain, atol=1e-5)

    def test_single_pair_api(self, stores):
        plain, shard, info = stores
        seed = (np.linalg.inv(info["T_gt"][2]) @ info["T_gt"][3])
        T_p = plain.compute_transformation(2, 3, seed)
        T_s = shard.compute_transformation(2, 3, seed)
        np.testing.assert_allclose(T_s, T_p, atol=1e-5)


class TestMultihostAssembly:
    def test_assemble_global_scans_single_process(self, stores):
        # single-process degenerate case: local shard = everything; the
        # assembled global array must equal a plain sharded device_put
        plain, shard, info = stores
        from lidar_slam_arvc_tpu.parallel.multihost import (
            assemble_global_scans, host_scan_shard)
        mesh = data_mesh(8)
        pts = np.asarray(plain.points)
        n = pts.shape[0]
        pad = (-n) % 8
        pts_p = np.concatenate([pts, np.repeat(pts[-1:], pad, axis=0)])
        idx = host_scan_shard(len(pts_p), 0, 1)
        assert len(idx) == len(pts_p)        # one process owns all scans
        out = assemble_global_scans(mesh, {"points": pts_p[idx]},
                                    len(pts_p))
        assert out["points"].shape == pts_p.shape
        assert len(out["points"].sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(out["points"]), pts_p)
