"""Multi-device CLI pipeline: mesh-sharded stage 1 + distributed stage 2
must reproduce the single-device CSVs (virtual 8-device CPU mesh).

This is the pipeline-level counterpart of tests/test_parallel.py: the same
code paths a user hits via ``--devices 8`` (pipeline/scanmatcher.py
_mesh_matcher, graph/builder.py optimize(solver='schur')), not the parallel/
library in isolation.
"""

import shutil

import numpy as np
import pytest

import jax

from lidar_slam_arvc_tpu.io import EurocDataset
from lidar_slam_arvc_tpu.pipeline.graphslam import run_graphslam
from lidar_slam_arvc_tpu.pipeline.scanmatcher import run_scanmatcher
from lidar_slam_arvc_tpu.utils import synthetic
from lidar_slam_arvc_tpu.utils.config import IcpConfig
from lidar_slam_arvc_tpu.utils.metrics import ate

N_SCANS = 16
CFG_KW = dict(raw_capacity=4096, capacity=2048, batch_size=2,
              max_iterations=15)


@pytest.fixture(scope="module")
def datasets(tmp_path_factory):
    """The same synthetic dataset twice (stages write into the dataset dir,
    so the two runs need separate copies)."""
    d1 = str(tmp_path_factory.mktemp("euroc_single"))
    info = synthetic.make_dataset(
        d1, n_scans=N_SCANS, seed=7, radius=8.0, scan_points=2000,
        scanmatcher_params={"voxel_size": 0.2, "method": "icppointplane",
                            "delta_time": 1.0, "start_index": 0},
        slam_params={"perform_loop_closing": False,
                     "skip_optimization": 5})
    d8 = str(tmp_path_factory.mktemp("euroc_mesh"))
    shutil.rmtree(d8)
    shutil.copytree(d1, d8)
    return d1, d8, info


class TestMeshPipeline:
    def test_enough_devices(self):
        assert len(jax.devices()) >= 8

    def test_stage1_matches_single_device(self, datasets):
        d1, d8, info = datasets
        out1 = run_scanmatcher(d1, cfg=IcpConfig(**CFG_KW), progress=False)
        out8 = run_scanmatcher(d8, cfg=IcpConfig(mesh_devices=8, **CFG_KW),
                               progress=False)
        # identical programs per pair, deviceful layout aside -> bit-close
        np.testing.assert_allclose(out8["relative"], out1["relative"],
                                   atol=1e-5)
        r1 = EurocDataset(d1).read_trajectory(
            "/robot0/scanmatcher/scanmatcher_relative.csv")[1]
        r8 = EurocDataset(d8).read_trajectory(
            "/robot0/scanmatcher/scanmatcher_relative.csv")[1]
        np.testing.assert_allclose(r8, r1, atol=1e-5)
        # and it is actually good, not just consistent
        assert ate(out8["global"], info["T_gt"])["rmse"] < 0.2

    def test_stage2_matches_single_device(self, datasets):
        d1, d8, info = datasets
        out1 = run_graphslam(d1, cfg=IcpConfig(**CFG_KW), progress=False)
        out8 = run_graphslam(d8, cfg=IcpConfig(mesh_devices=8, **CFG_KW),
                             progress=False)
        # schur vs dense agree to solver tolerance (see test_parallel.py);
        # folded over a 16-pose trajectory that stays in the mm range
        np.testing.assert_allclose(
            np.asarray(out8["solution"])[:, :3, 3],
            np.asarray(out1["solution"])[:, :3, 3], atol=5e-3)
        s1 = EurocDataset(d1).read_trajectory(
            "/robot0/SLAM/solution_graphslam.csv")[1]
        s8 = EurocDataset(d8).read_trajectory(
            "/robot0/SLAM/solution_graphslam.csv")[1]
        np.testing.assert_allclose(s8[:, :3, 3], s1[:, :3, 3], atol=5e-3)

    def test_cli_devices_flag(self, datasets):
        d1, d8, info = datasets
        from lidar_slam_arvc_tpu.pipeline import cli
        assert cli.main(["scanmatch", "-i", d8, "--capacity", "2048",
                         "--batch-size", "2", "--devices", "8"]) == 0
