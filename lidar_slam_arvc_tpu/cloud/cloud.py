"""Fixed-capacity cloud container + crop filters."""

from __future__ import annotations

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
