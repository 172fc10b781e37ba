"""Loop-closure detection: radius-gated candidates + triangle consistency."""

from lidar_slam_arvc_tpu.loop.loopclosing import LoopCloser

__all__ = ["LoopCloser"]
