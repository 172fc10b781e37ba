"""Dataset viewer: trajectory plots + global map export.

Parity with reference run_map_viewer.py:102-158 (main): prefer the SLAM
solution, fall back to the scanmatcher trajectory; draw loop-closure chords;
build and export the global map.  Artifacts land in <dataset>/robot0/viz/.
"""

from __future__ import annotations

import os

from lidar_slam_arvc_tpu.io import EurocDataset
from lidar_slam_arvc_tpu.viz.mapping import build_map, write_ply
from lidar_slam_arvc_tpu.viz.plots import (
    plot_trajectory, plot_trajectory_with_loop_closures,
)


def view_dataset(directory: str, keyframe_sampling: int = 10,
                 voxel_size: float | None = 0.2) -> dict:
    euroc = EurocDataset(directory)
    out_dir = f"{directory}/robot0/viz"
    os.makedirs(out_dir, exist_ok=True)

    loop_pairs = []
    try:
        times, T = euroc.read_trajectory("/robot0/SLAM/solution_graphslam.csv")
        source = "SLAM"
        try:
            lc = euroc.read_csv("/robot0/SLAM/loop_closures.csv")
            loop_pairs = list(zip(lc["i"].astype(int), lc["j"].astype(int)))
        except FileNotFoundError:
            pass
    except FileNotFoundError:
        times, T = euroc.read_trajectory(
            "/robot0/scanmatcher/scanmatcher_global.csv")
        source = "scanmatcher"

    plot_trajectory(T, f"{out_dir}/trajectory.png", label=source)
    plot_trajectory_with_loop_closures(
        T, loop_pairs, f"{out_dir}/trajectory_loop_closures.png")

    cloud = build_map(directory, T, times,
                      keyframe_sampling=keyframe_sampling,
                      voxel_size=voxel_size)
    ply_path = f"{out_dir}/map.ply"
    write_ply(ply_path, cloud)
    from lidar_slam_arvc_tpu.io import write_pcd
    write_pcd(f"{out_dir}/map.pcd", cloud)
    print(f"viewer: {source} trajectory ({len(T)} poses, "
          f"{len(loop_pairs)} loop closures), map {len(cloud)} points "
          f"-> {out_dir}")
    return {"source": source, "poses": len(T), "map_points": len(cloud),
            "out_dir": out_dir}
