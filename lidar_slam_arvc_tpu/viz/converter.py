"""Dataset converter: per-scan PCD -> PLY export.

Parity with reference run_converter.py:138-191 (converter): iterate the
scan list and save each cloud under robot0/lidar/dataply/<t>.ply.  The
reference's alpha-shape surface meshing (keyframe.py:53-59, Open3D C++
CGAL-style reconstruction) is out of SLAM scope (SURVEY.md non-goals);
point-cloud PLY export preserves the artifact contract.
"""

from __future__ import annotations

import os

from lidar_slam_arvc_tpu.io import EurocDataset, read_pcd
from lidar_slam_arvc_tpu.viz.mapping import write_ply


def convert_dataset(directory: str, sampling: int = 1) -> int:
    euroc = EurocDataset(directory)
    df = euroc.read_csv("/robot0/lidar/data.csv")
    times = df["#timestamp [ns]"].to_numpy()
    out_dir = f"{directory}/robot0/lidar/dataply"
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for t in times[::sampling]:
        pts = read_pcd(euroc.scan_pcd_path(t))
        write_ply(f"{out_dir}/{t}.ply", pts)
        n += 1
    print(f"converter: wrote {n} PLY files -> {out_dir}")
    return n
