"""Scan-pair ICP sharded over the device mesh.

The batch of (src, tgt) pairs is independent work (odometry seeds decouple
pairs — SURVEY.md §2.3), so sharding the leading batch axis over the mesh's
``data`` axis makes XLA run each shard's pairs on its own device with no
communication until results gather.  This replaces the reference's
sequential hot loop (run_scanmatcher.py:196-213) at multi-chip scale.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lidar_slam_arvc_tpu.registration import ICPParams, icp_batch


def sharded_icp_batch(mesh: Mesh, src_points, src_masks, tgt_points,
                      tgt_masks, tgt_normals, T_inits,
                      params: ICPParams = ICPParams(),
                      method: str = "point_to_plane", axis: str = "data"):
    """icp_batch with the pair axis sharded over ``mesh``.

    The batch size must be divisible by the mesh size.  Outputs are sharded
    the same way; callers typically pull them to host right after.
    """
    batch_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    args = tuple(jax.device_put(a, batch_sharding) for a in
                 (src_points, src_masks, tgt_points, tgt_masks,
                  tgt_normals, T_inits))

    fn = jax.jit(
        lambda *a: icp_batch(*a, params, method),
        in_shardings=(batch_sharding,) * 6,
        out_shardings=batch_sharding,
    )
    return fn(*args)
