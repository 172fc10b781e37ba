"""Sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidar_slam_arvc_tpu.parallel import (
    data_mesh, distributed_assemble, distributed_lm_step, sharded_icp_batch,
)
from lidar_slam_arvc_tpu.graph import PoseGraph
from lidar_slam_arvc_tpu.graph.solver import _assemble
from lidar_slam_arvc_tpu.registration import ICPParams, icp_batch


@pytest.fixture(scope="module")
def pair_batch():
    import __graft_entry__
    return __graft_entry__._tiny_pair_batch(batch=8, cap=256, seed=3)


class TestShardedICP:
    def test_matches_unsharded(self, pair_batch):
        assert len(jax.devices()) >= 4
        mesh = data_mesh(4)
        params = ICPParams(max_correspondence_distance=5.0, max_iterations=5,
                           src_block=128, tgt_block=128)
        sharded = sharded_icp_batch(mesh, *pair_batch, params=params)
        plain = icp_batch(*pair_batch, params, "point_to_plane")
        np.testing.assert_allclose(np.asarray(sharded.transform),
                                   np.asarray(plain.transform), atol=1e-4)

    def test_output_is_sharded(self, pair_batch):
        mesh = data_mesh(4)
        params = ICPParams(max_correspondence_distance=5.0, max_iterations=2,
                           src_block=128, tgt_block=128)
        out = sharded_icp_batch(mesh, *pair_batch, params=params)
        assert len(out.transform.sharding.device_set) == 4


class TestDistributedSolver:
    def _graph(self):
        rng = np.random.default_rng(0)
        from lidar_slam_arvc_tpu.utils import synthetic
        n = 16
        T_gt = synthetic.make_trajectory(n, radius=5.0)
        g = PoseGraph(max_poses=16, max_between=64, max_gps=16)
        g.init_graph()
        for i in range(n - 1):
            rel = np.linalg.inv(T_gt[i]) @ T_gt[i + 1]
            rel[:3, 3] += rng.normal(scale=0.01, size=3)
            g.add_initial_estimate(rel, i + 1)
            g.add_edge(rel, i, i + 1, "SM")
        return g

    def test_assemble_matches_single_device(self):
        g = self._graph()
        mesh = data_mesh(8)
        poses = jnp.asarray(g.poses)
        fd = g._factor_data()
        H_d, b_d = distributed_assemble(mesh, poses, fd, g.n_poses)
        H_s, b_s = _assemble(poses, fd, jnp.asarray(g.n_poses))
        np.testing.assert_allclose(np.asarray(H_d), np.asarray(H_s),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(b_d), np.asarray(b_s),
                                   atol=1e-3)

    def test_lm_step_reduces_cost(self):
        from lidar_slam_arvc_tpu.graph.solver import graph_cost
        g = self._graph()
        mesh = data_mesh(8)
        poses = jnp.asarray(g.poses)
        fd = g._factor_data()
        c0 = float(graph_cost(poses, fd))
        new_poses, c1 = distributed_lm_step(mesh, poses, fd, g.n_poses)
        assert float(c1) <= c0 + 1e-6


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import __graft_entry__
        fn, args = __graft_entry__.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (2, 4, 4)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_dryrun_multichip(self):
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)


class TestMultihost:
    def test_initialize_single_process(self):
        from lidar_slam_arvc_tpu.parallel import multihost
        rep = multihost.initialize()
        assert rep["process_count"] == 1
        assert rep["global_devices"] >= 1

    def test_host_scan_shard_partition(self):
        from lidar_slam_arvc_tpu.parallel.multihost import host_scan_shard
        n = 103
        shards = [host_scan_shard(n, pi, 4) for pi in range(4)]
        # union covers all scans; consecutive pairs computable per shard
        covered = set()
        for s in shards:
            covered.update(s.tolist())
        assert covered == set(range(n))
        # overlap: every shard after the first starts one before its block
        assert shards[1][0] == shards[0][-1]


class TestSchurSolver:
    """Distributed Schur elimination vs the dense damped step (exact)."""

    def _graph_with_loops(self, n=48, gps=True):
        rng = np.random.default_rng(0)
        from lidar_slam_arvc_tpu.utils import synthetic
        T_gt = synthetic.make_trajectory(n, radius=5.0)
        g = PoseGraph(max_poses=64, max_between=128, max_gps=16)
        g.init_graph()
        for i in range(n - 1):
            rel = np.linalg.inv(T_gt[i]) @ T_gt[i + 1]
            rel[:3, 3] += rng.normal(scale=0.02, size=3)
            g.add_initial_estimate(rel, i + 1)
            g.add_edge(rel, i, i + 1, "SM")
        for (a, b) in [(2, 40), (5, 30), (12, 44)]:
            g.add_edge(np.linalg.inv(T_gt[a]) @ T_gt[b], a, b, "SM")
        if gps:
            # 0/20/41 are interior; 40 is a loop-closure endpoint, i.e. a
            # separator — covers the unary-factor-on-separator routing
            for i in (0, 20, 40, 41):
                z = T_gt[i][:3, 3] + rng.normal(scale=0.1, size=3)
                g.add_gps_factor(z[0], z[1], z[2], i)
        return g

    def test_step_matches_dense(self):
        from lidar_slam_arvc_tpu.graph.solver import _lm_step
        from lidar_slam_arvc_tpu.parallel import schur_lm_step
        g = self._graph_with_loops()
        mesh = data_mesh(8)
        poses = jnp.asarray(g.poses)
        fd = g._factor_data()
        ref, _ = _lm_step(poses, fd, jnp.int32(g.n_poses), jnp.float32(1e-4))
        out, _, n_sep = schur_lm_step(mesh, poses, fd, g.n_poses, lam=1e-4,
                                      sep_capacity=32)
        assert int(n_sep) <= 32
        np.testing.assert_allclose(np.asarray(out[:g.n_poses]),
                                   np.asarray(ref[:g.n_poses]), atol=2e-4)

    def test_solve_graph_converges(self):
        from lidar_slam_arvc_tpu.graph.solver import graph_cost, solve_graph
        from lidar_slam_arvc_tpu.parallel import schur_solve_graph
        g = self._graph_with_loops(gps=False)
        mesh = data_mesh(8)
        poses = jnp.asarray(g.poses)
        fd = g._factor_data()
        c0 = float(graph_cost(poses, fd))
        p_schur, c_schur = schur_solve_graph(mesh, poses, fd, g.n_poses,
                                             sep_capacity=32,
                                             max_iterations=8)
        _, c_dense = solve_graph(poses, fd, g.n_poses, max_iterations=8)
        assert c_schur < 0.5 * c0
        assert c_schur <= 1.05 * c_dense + 1e-6

    def test_separator_overflow_detected(self):
        from lidar_slam_arvc_tpu.parallel import schur_solve_graph
        g = self._graph_with_loops()
        mesh = data_mesh(8)
        with pytest.raises(ValueError, match="separator count"):
            schur_solve_graph(mesh, jnp.asarray(g.poses), g._factor_data(),
                              g.n_poses, sep_capacity=8, max_iterations=2)
