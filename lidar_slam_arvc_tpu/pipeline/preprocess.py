"""Batched scan preprocessing: crop -> voxel downsample -> normals (-> split).

Device-side equivalent of KeyFrame.pre_process's per-method dispatch
(reference keyframe.py:113-229), restructured as one jitted vmapped program
over a batch of raw scans.  Instead of lazy per-object Open3D mutations the
whole batch flows through fixed-shape tensors once.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidar_slam_arvc_tpu import cloud as cl
from lidar_slam_arvc_tpu.utils.config import IcpConfig


class PreprocessedScans(NamedTuple):
    """Stacked preprocessed scans (leading axis = scan index)."""
    points: jax.Array                    # (N, CAP, 3)
    mask: jax.Array                      # (N, CAP)
    normals: jax.Array                   # (N, CAP, 3) — zeros if not needed
    ground_mask: jax.Array | None = None     # (N, CAP) for icp2planes
    nonground_mask: jax.Array | None = None  # (N, CAP)
    # occupied voxels BEFORE capacity truncation: n_voxels[i] > CAP means
    # scan i silently lost its tail — surfaced in the stage profile
    n_voxels: jax.Array | None = None        # (N,) int32


def _pre_one(raw_pts, raw_mask, key, cfg: IcpConfig, method: str,
             voxel_size: float | None):
    c = cl.Cloud(raw_pts, raw_mask)
    c = cl.crop_radius_height(c, cfg.min_radius, cfg.max_radius,
                              cfg.min_height, cfg.max_height)
    if voxel_size is not None:
        # Static guard: the packed 32-bit voxel key addresses
        # 2048 x 2048 x 1024 cells; the crop bounds the cloud extent, so a
        # too-fine grid for these bounds is detectable at trace time
        # instead of silently merging the far field into border voxels.
        from lidar_slam_arvc_tpu.cloud.voxel import addressable_extent
        ext_xy, ext_z = addressable_extent(voxel_size)
        if 2 * cfg.max_radius > ext_xy or (cfg.max_height
                                           - cfg.min_height) > ext_z:
            raise ValueError(
                f"voxel_size={voxel_size} cannot address the cropped "
                f"extent ({2 * cfg.max_radius:.1f} m xy, "
                f"{cfg.max_height - cfg.min_height:.1f} m z) within the "
                f"32-bit key ({ext_xy:.1f} x {ext_z:.1f} m); coarsen the "
                "voxel size or tighten the crop")
        c, n_vox = cl.voxel_downsample_counted(c, voxel_size,
                                               out_capacity=cfg.capacity)
    else:
        # full resolution (reference run_graphSLAM.py:224 loop-closure
        # regime): compact without merging — output points are a subset of
        # the input, never voxel centroids
        c, n_vox = cl.compact_counted(c, out_capacity=cfg.capacity)

    # Covariance normals need >= ~8 ball neighbors; on a voxelized cloud
    # that means a radius of a few voxels.  The reference's fixed 0.3 m
    # (keyframe.py:33) assumes full-resolution clouds and collapses to <3
    # neighbors on coarse grids, so scale with the voxel size.
    normal_radius = cfg.normal_radius
    if voxel_size is not None:
        normal_radius = max(normal_radius, 2.5 * voxel_size)

    ground_mask = nonground_mask = None
    if method == "icppointplane":
        c = cl.estimate_normals(c, normal_radius)
    elif method in ("icp2planes", "fpfh"):
        c = cl.estimate_normals(c, normal_radius)
        plane = cl.ransac_ground_plane(c, key, seed_height=-0.5,
                                       distance_threshold=0.01,
                                       num_iterations=1000)
        g, ng = cl.split_by_plane(c, plane, 0.4)
        ground_mask, nonground_mask = g.mask, ng.mask
    normals = c.normals if c.normals is not None else jnp.zeros_like(c.points)
    return c.points, c.mask, normals, ground_mask, nonground_mask, n_vox


@functools.partial(jax.jit, static_argnames=("cfg", "method", "voxel_size"))
def preprocess_batch(raw_pts, raw_mask, keys, cfg: IcpConfig, method: str,
                     voxel_size: float | None):
    """vmap of the per-scan preprocess over a batch of raw scans."""
    fn = functools.partial(_pre_one, cfg=cfg, method=method,
                           voxel_size=voxel_size)
    pts, mask, normals, g, ng, n_vox = jax.vmap(fn)(raw_pts, raw_mask, keys)
    return PreprocessedScans(points=pts, mask=mask, normals=normals,
                             ground_mask=g, nonground_mask=ng,
                             n_voxels=n_vox)
