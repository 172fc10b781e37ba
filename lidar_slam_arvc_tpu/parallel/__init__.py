"""Multi-chip scaling: mesh helpers, sharded batched ICP, distributed solve.

The reference is single-process/single-thread (SURVEY.md §2.3); here the
parallel units are (a) data parallelism over independent scan pairs — the
scanmatcher's batch axis sharded over the mesh — and (b) the pose-graph
normal equations assembled from mesh-sharded factor blocks and reduced with
``psum`` before a replicated dense solve.
"""

from lidar_slam_arvc_tpu.parallel.mesh import data_mesh, shard_batch
from lidar_slam_arvc_tpu.parallel.sharded_icp import sharded_icp_batch
from lidar_slam_arvc_tpu.parallel.dist_solver import (
    distributed_assemble, distributed_lm_step,
)

__all__ = ["data_mesh", "shard_batch", "sharded_icp_batch",
           "distributed_assemble", "distributed_lm_step"]
