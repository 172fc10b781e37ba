"""Voxel-grid downsampling with static shapes.

Replaces Open3D's C++ ``voxel_down_sample`` (reference keyframe.py:108-111):
each voxel's points are replaced by their centroid.  TPU-native formulation:
pack voxel indices into one 32-bit key, sort, detect run starts, assign
compacted output slots with a cumulative sum, and scatter-add coordinates —
all static-shape device ops (no host compaction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lidar_slam_arvc_tpu.cloud.cloud import Cloud

# key packing: 11 bits x | 11 bits y | 10 bits z  (32-bit total)
_BITS_X, _BITS_Y, _BITS_Z = 11, 11, 10


def addressable_extent(voxel_size: float) -> tuple[float, float]:
    """(xy, z) metres addressable by the packed key at this cell size.

    Beyond this the grid clips at the border and merges the far field into
    border voxels — callers that know their crop bounds (the pipeline does)
    should reject too-fine grids at trace time rather than corrupt
    geometry.  Full-resolution clouds must use ``cloud.compact_counted``,
    never a degenerate fine grid.
    """
    return ((2 ** _BITS_X - 1) * voxel_size, (2 ** _BITS_Z - 1) * voxel_size)


@functools.partial(jax.jit, static_argnames=("out_capacity",))
def voxel_downsample_counted(cloud: Cloud, voxel_size: float,
                             out_capacity: int | None = None):
    """Centroid-per-voxel downsample, returning (Cloud, n_voxels).

    ``n_voxels`` is the occupied-voxel count BEFORE capacity truncation, so
    ``max(n_voxels - out_capacity, 0)`` is the number of silently dropped
    voxels — the pipeline surfaces this in its profile artifact instead of
    losing the densest tail without a trace (the full-resolution
    loop-closure regime of reference run_graphSLAM.py:224 routinely exceeds
    16k points per scan).

    out_capacity defaults to the input capacity.  Grid extents beyond
    2048 x 2048 x 1024 voxels (e.g. 100m+ range at 5cm voxels) clip at the
    border — unreachable under the pipeline's radius/height crop.  If the
    number of occupied voxels exceeds out_capacity the tail voxels
    (highest keys) are dropped.
    """
    capacity = cloud.points.shape[0]
    if out_capacity is None:
        out_capacity = capacity
    pts = cloud.points
    valid = cloud.mask

    vsize = jnp.asarray(voxel_size, dtype=pts.dtype)
    # min corner over valid points (invalid rows excluded via +inf)
    masked = jnp.where(valid[:, None], pts, jnp.inf)
    mins = jnp.min(masked, axis=0)
    mins = jnp.where(jnp.isfinite(mins), mins, 0.0)
    ijk = jnp.floor((pts - mins) / vsize).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, jnp.asarray(
        [2 ** _BITS_X - 1, 2 ** _BITS_Y - 1, 2 ** _BITS_Z - 1], dtype=jnp.int32))
    key = ((ijk[:, 0] << (_BITS_Y + _BITS_Z))
           | (ijk[:, 1] << _BITS_Z)
           | ijk[:, 2])
    # invalid points get the max key so they sort to the end
    key = jnp.where(valid, key, jnp.int32(2 ** 31 - 1))

    order = jnp.argsort(key)
    key_s = key[order]
    pts_s = pts[order]
    valid_s = valid[order]

    first = jnp.concatenate(
        [jnp.ones(1, dtype=bool), key_s[1:] != key_s[:-1]]) & valid_s
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_voxels = jnp.max(jnp.where(valid_s, slot + 1, 0))

    # scatter into out_capacity+1 rows; invalid/overflow land in the last row
    slot = jnp.where(valid_s & (slot < out_capacity), slot, out_capacity)
    sums = jnp.zeros((out_capacity + 1, 3), dtype=pts.dtype).at[slot].add(pts_s)
    counts = jnp.zeros(out_capacity + 1, dtype=pts.dtype).at[slot].add(1.0)

    counts_out = counts[:out_capacity]
    centroids = sums[:out_capacity] / jnp.maximum(counts_out[:, None], 1.0)
    out_mask = jnp.arange(out_capacity) < jnp.minimum(n_voxels, out_capacity)
    return Cloud(points=jnp.where(out_mask[:, None], centroids, 0.0),
                 mask=out_mask), n_voxels


def voxel_downsample(cloud: Cloud, voxel_size: float,
                     out_capacity: int | None = None) -> Cloud:
    """voxel_downsample_counted without the occupancy count (see there)."""
    return voxel_downsample_counted(cloud, voxel_size, out_capacity)[0]
