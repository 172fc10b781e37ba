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

    def test_stage1_sharded_scan_stack(self, datasets, tmp_path):
        """--shard-scans: the scan stack sharded over the mesh (2 scans per
        device + ppermute halo) must reproduce the replicated-stack result
        bit-close, through the real run_scanmatcher path."""
        d1, d8, info = datasets
        dsh = str(tmp_path / "euroc_sharded")
        shutil.copytree(d1, dsh)
        out1 = run_scanmatcher(d1, cfg=IcpConfig(**CFG_KW), progress=False)
        outs = run_scanmatcher(
            dsh, cfg=IcpConfig(mesh_devices=8, shard_scans=True, **CFG_KW),
            progress=False)
        np.testing.assert_allclose(outs["relative"], out1["relative"],
                                   atol=1e-5)
        assert ate(outs["global"], info["T_gt"])["rmse"] < 0.2

    def test_sharded_stack_pair_layout(self):
        """Unit check of the halo/self-pair layout: n_scans NOT divisible by
        the mesh, so padding rows and the cyclic-wrap row are all exercised."""
        import jax.numpy as jnp
        from lidar_slam_arvc_tpu.parallel.mesh import resolve_mesh
        from lidar_slam_arvc_tpu.pipeline.scanmatcher import (
            _sharded_stack_dispatch, preprocess_all)
        from lidar_slam_arvc_tpu.registration import ICPParams
        from lidar_slam_arvc_tpu.cloud import from_numpy, estimate_normals

        rng = np.random.default_rng(3)
        mesh = resolve_mesh(8)
        n_scans, cap = 13, 512          # 13 scans over 8 devices: K=2, pad=3
        world = synthetic.make_world(rng, extent=8.0, n_ground=800,
                                     n_pillars=6, pillar_pts=60)
        T_gt = synthetic.make_trajectory(n_scans, radius=5.0)
        clouds = []
        for i in range(n_scans):
            scan = synthetic.render_scan(world, T_gt[i], rng,
                                         max_range=10.0, max_points=cap)
            c = from_numpy(scan, cap)
            clouds.append(estimate_normals(c, radius=0.6))
        points = jnp.stack([c.points for c in clouds])
        mask = jnp.stack([c.mask for c in clouds])
        normals = jnp.stack([c.normals for c in clouds])
        seeds = np.stack([np.linalg.inv(T_gt[i]) @ T_gt[i + 1]
                          for i in range(n_scans - 1)])
        params = ICPParams(max_correspondence_distance=5.0,
                           max_iterations=10)
        T, fit, delta = _sharded_stack_dispatch(
            mesh, points, mask, normals, seeds, params, "point_to_plane", 2)
        assert T.shape == (n_scans - 1, 4, 4)
        assert (fit > 0.5).all()
        # the layout must route every pair to the same (src, tgt) clouds the
        # single-device fused dispatch uses — bit-close across all 12 pairs,
        # including the 3 whose source arrives via the ppermute halo
        from lidar_slam_arvc_tpu.pipeline.scanmatcher import _match_all_fused
        idx_src = jnp.arange(1, n_scans)
        idx_tgt = jnp.arange(0, n_scans - 1)
        T_ref, _, _, _ = _match_all_fused(
            points, mask, normals, idx_src, idx_tgt,
            jnp.asarray(seeds, dtype=jnp.float32), params,
            "point_to_plane", 2)
        np.testing.assert_allclose(T, np.asarray(T_ref), atol=1e-5)
