"""Point-cloud ops on fixed-capacity padded tensors.

The reference wraps every scan in an Open3D C++ PointCloud and mutates it
(filter -> voxel_down_sample -> estimate_normals, reference
keyframemanager/keyframe.py:74-229).  Here a cloud is a pair of device
tensors — (capacity, 3) points + (capacity,) validity mask — with static
shapes so every per-scan operation jits once and batches across scans.
"""

from lidar_slam_arvc_tpu.cloud.cloud import (
    Cloud, from_numpy, to_numpy, crop_radius_height, num_valid,
    compact_counted,
)
from lidar_slam_arvc_tpu.cloud.voxel import (
    voxel_downsample, voxel_downsample_counted,
)
from lidar_slam_arvc_tpu.cloud.normals import estimate_normals
from lidar_slam_arvc_tpu.cloud.plane import (
    ransac_ground_plane, split_by_plane, refine_plane_lsq,
)

__all__ = [
    "Cloud", "from_numpy", "to_numpy", "crop_radius_height", "num_valid",
    "compact_counted",
    "voxel_downsample", "voxel_downsample_counted", "estimate_normals",
    "ransac_ground_plane", "split_by_plane", "refine_plane_lsq",
]
