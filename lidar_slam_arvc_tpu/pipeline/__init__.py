"""Pipeline drivers: scanmatcher (stage 1), graphSLAM (stage 2), viewer, CLI.

Stage contract is the reference's (SURVEY.md §1 L5/L6): stages communicate
through CSV artifacts inside the dataset directory, so each stage can be
re-run independently and artifacts interoperate with the reference pipeline.
"""

from lidar_slam_arvc_tpu.pipeline.scanmatcher import run_scanmatcher
from lidar_slam_arvc_tpu.pipeline.graphslam import run_graphslam

__all__ = ["run_scanmatcher", "run_graphslam"]
