"""Fixed-capacity cloud container + crop filters."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Cloud(NamedTuple):
    """A padded point cloud: static-capacity points + validity mask.

    ``normals`` is optional ((capacity, 3) or None) and is populated by
    :func:`lidar_slam_arvc_tpu.cloud.estimate_normals`.
    """
    points: jax.Array            # (capacity, 3) float32
    mask: jax.Array              # (capacity,)  bool
    normals: jax.Array | None = None


def from_numpy(points: np.ndarray, capacity: int) -> Cloud:
    """Pad/truncate an (N, 3) host array into a fixed-capacity Cloud.

    Truncation keeps a uniform stride of points (not a prefix) so a scan
    denser than the capacity degrades like uniform downsampling.
    """
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    if n > capacity:
        idx = np.linspace(0, n - 1, capacity).round().astype(np.int64)
        points = points[idx]
        n = capacity
    buf = np.zeros((capacity, 3), dtype=np.float32)
    buf[:n] = points
    mask = np.zeros(capacity, dtype=bool)
    mask[:n] = True
    return Cloud(points=jnp.asarray(buf), mask=jnp.asarray(mask))


def to_numpy(cloud: Cloud) -> np.ndarray:
    """Valid points as a host (N, 3) array."""
    pts = np.asarray(cloud.points)
    mask = np.asarray(cloud.mask)
    return pts[mask]


def num_valid(cloud: Cloud) -> jax.Array:
    return jnp.sum(cloud.mask.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("out_capacity",))
def compact_counted(cloud: Cloud, out_capacity: int | None = None):
    """Compact valid points into a fixed-capacity prefix WITHOUT merging.

    The full-resolution route: the reference's loop-closure stage passes
    voxel None (run_graphSLAM.py:224) so ICP sees raw geometry.  A spatial
    key is deliberately NOT used here — routing full-resolution clouds
    through a degenerate fine voxel grid silently merged everything beyond
    the 32-bit key's ~20 m addressable extent into border voxels,
    fabricating centroids metres away from any real point.  This path
    guarantees output points are a subset of input points.

    If more than ``out_capacity`` points are valid, a uniform stride over
    the valid points is kept (same degradation policy as ``from_numpy``);
    the pre-truncation valid count is returned so callers can surface the
    drop, mirroring ``voxel_downsample_counted``'s contract.
    """
    capacity = cloud.points.shape[0]
    if out_capacity is None:
        out_capacity = capacity
    if out_capacity > capacity:
        # the order[:out_capacity] slice below can only produce `capacity`
        # rows — growing a cloud is not this function's job
        raise ValueError(
            f"compact_counted: out_capacity {out_capacity} exceeds the "
            f"input capacity {capacity}; pad the input cloud instead")
    # The uniform-selection test below multiplies rank (< capacity) by the
    # kept count (<= out_capacity) in int32; guard the static shapes so the
    # product cannot wrap.  Default shapes (raw 65536 -> 16384) give 2^30.
    if capacity * out_capacity >= 2 ** 31:
        raise ValueError(
            f"compact_counted: capacity {capacity} x out_capacity "
            f"{out_capacity} overflows the int32 uniform-selection "
            "arithmetic; reduce capacities or add a chunked path")
    valid = cloud.mask
    n = jnp.sum(valid.astype(jnp.int32))
    k = jnp.minimum(n, out_capacity)
    # rank of each point among the valid ones; select exactly k of the n
    # valid points, uniformly: rank r is kept iff floor((r+1)k/n) >
    # floor(rk/n) (telescopes to exactly k kept).
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    nn = jnp.maximum(n, 1)
    sel = valid & (((rank + 1) * k) // nn > (rank * k) // nn)
    # stable partition: selected points to the front, original order kept
    order = jnp.argsort(jnp.where(sel, 0, 1), stable=True)
    pts = cloud.points[order[:out_capacity]]
    out_mask = jnp.arange(out_capacity) < k
    return Cloud(points=jnp.where(out_mask[:, None], pts, 0.0),
                 mask=out_mask), n


def crop_radius_height(cloud: Cloud, min_radius: float, max_radius: float,
                       min_height: float, max_height: float) -> Cloud:
    """Keep points with min_r < sqrt(x^2+y^2) < max_r and min_h < z < max_h.

    Mask-only update — same semantics as reference keyframe.py:74-94
    (filter_radius_height), which physically rebuilds the cloud.
    """
    x, y, z = cloud.points[:, 0], cloud.points[:, 1], cloud.points[:, 2]
    r2 = x * x + y * y
    keep = ((r2 < max_radius ** 2) & (r2 > min_radius ** 2)
            & (z > min_height) & (z < max_height))
    return Cloud(points=cloud.points, mask=cloud.mask & keep,
                 normals=cloud.normals)
