"""Keyframe management: scan registry + batched device preprocessing."""

from lidar_slam_arvc_tpu.keyframes.store import KeyframeStore

__all__ = ["KeyframeStore"]
