"""Multi-chip scaling: mesh helpers, sharded batched ICP, distributed solve.

The reference is single-process/single-thread (SURVEY.md §2.3); here the
parallel units are (a) data parallelism over independent scan pairs — the
scanmatcher's batch axis sharded over the mesh — and (b) the pose-graph
normal equations assembled from mesh-sharded factor blocks and reduced with
``psum`` before a replicated dense solve, or eliminated chunk-wise via the
distributed Schur complement (parallel/schur.py) where only the small
separator system is communicated.
"""

from lidar_slam_arvc_tpu.parallel.mesh import data_mesh, shard_batch
from lidar_slam_arvc_tpu.parallel.sharded_icp import sharded_icp_batch
from lidar_slam_arvc_tpu.parallel.dist_solver import (
    distributed_assemble, distributed_lm_step,
)
from lidar_slam_arvc_tpu.parallel.schur import (
    schur_lm_step, schur_lm_step_jit, schur_solve_graph,
)

__all__ = ["data_mesh", "shard_batch", "sharded_icp_batch",
           "distributed_assemble", "distributed_lm_step",
           "schur_lm_step", "schur_lm_step_jit", "schur_solve_graph"]
