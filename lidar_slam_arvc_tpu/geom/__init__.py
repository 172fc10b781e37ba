"""SO(3)/SE(3) algebra in pure JAX, batched and jit-friendly.

Conventions (chosen for interop with the reference pipeline's artelib layer):
  * quaternions are stored **wxyz** (reference: artelib/quaternion.py,
    artelib/homogeneousmatrix.py:153-164),
  * Euler angles follow the XYZ mobile-axes convention, R = Rx@Ry@Rz
    (reference: artelib/tools.py:226-238), with both solution branches
    available (artelib/tools.py:241-275),
  * homogeneous transforms are (..., 4, 4) arrays; trajectories are stacked
    (N, 4, 4) tensors rather than Python lists of objects.
"""

from lidar_slam_arvc_tpu.geom.rotations import (
    quat_to_rot,
    rot_to_quat,
    quat_multiply,
    quat_conjugate,
    quat_normalize,
    quat_slerp,
    euler_to_rot,
    rot_to_euler,
    rot_to_euler_both,
    euler_to_quat,
    quat_to_euler,
    normalize_angle,
    so3_exp,
    so3_log,
    so3_hat,
    so3_vee,
)
from lidar_slam_arvc_tpu.geom.se3 import (
    make_transform,
    transform_from_quat,
    transform_from_euler,
    compose,
    inverse,
    transform_points,
    positions,
    rotations,
    t2v,
    se3_exp,
    se3_log,
    relative_transforms,
    global_transforms,
    multiply_by_transform,
    transforms_from_pose_columns,
    pose_columns_from_transforms,
)

__all__ = [
    "quat_to_rot", "rot_to_quat", "quat_multiply", "quat_conjugate",
    "quat_normalize", "quat_slerp", "euler_to_rot", "rot_to_euler",
    "rot_to_euler_both", "euler_to_quat", "quat_to_euler", "normalize_angle",
    "so3_exp", "so3_log", "so3_hat", "so3_vee",
    "make_transform", "transform_from_quat", "transform_from_euler",
    "compose", "inverse", "transform_points", "positions", "rotations",
    "t2v", "se3_exp", "se3_log", "relative_transforms", "global_transforms",
    "multiply_by_transform", "transforms_from_pose_columns",
    "pose_columns_from_transforms",
]
