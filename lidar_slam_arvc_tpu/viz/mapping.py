"""Global map construction + PLY export.

Equivalent of KeyFrameManager.build_map (reference keyframemanager.py:154-184)
minus the Open3D window: keyframes are sampled, cropped, voxel-downsampled,
transformed by their global poses, and concatenated into one host array.
Fixes the reference's sampling bug (build_map indexes sampled transforms
with unsampled keyframe indices, keyframemanager.py:171-176 / SURVEY §3.4)
by always pairing scan i with transform i.
"""

from __future__ import annotations

import os

import numpy as np

from lidar_slam_arvc_tpu.io import EurocDataset, read_pcd


def build_map(directory: str, global_transforms: np.ndarray,
              scan_times: np.ndarray, keyframe_sampling: int = 10,
              radii=(0.5, 35.0), heights=(-120.0, 120.0),
              voxel_size: float | None = 0.2,
              max_points_per_scan: int = 20000) -> np.ndarray:
    """Concatenated (M, 3) global cloud from every k-th keyframe."""
    euroc = EurocDataset(directory)
    chunks = []
    for i in range(0, len(scan_times), keyframe_sampling):
        pts = read_pcd(euroc.scan_pcd_path(scan_times[i]))
        r2 = pts[:, 0] ** 2 + pts[:, 1] ** 2
        keep = ((r2 > radii[0] ** 2) & (r2 < radii[1] ** 2)
                & (pts[:, 2] > heights[0]) & (pts[:, 2] < heights[1]))
        pts = pts[keep]
        if voxel_size:
            pts = _voxel_downsample_np(pts, voxel_size)
        if len(pts) > max_points_per_scan:
            pts = pts[np.linspace(0, len(pts) - 1,
                                  max_points_per_scan).astype(int)]
        T = global_transforms[i]
        chunks.append(pts @ T[:3, :3].T + T[:3, 3])
    return (np.concatenate(chunks).astype(np.float32)
            if chunks else np.zeros((0, 3), np.float32))


def _voxel_downsample_np(pts: np.ndarray, voxel: float) -> np.ndarray:
    keys = np.floor((pts - pts.min(0)) / voxel).astype(np.int64)
    key = keys[:, 0] * 4_000_000 + keys[:, 1] * 2000 + keys[:, 2]
    order = np.argsort(key)
    key_s = key[order]
    p_s = pts[order]
    first = np.concatenate([[True], key_s[1:] != key_s[:-1]])
    slot = np.cumsum(first) - 1
    sums = np.zeros((slot[-1] + 1, 3))
    np.add.at(sums, slot, p_s)
    counts = np.bincount(slot)
    return (sums / counts[:, None]).astype(np.float32)


def write_ply(path: str, points: np.ndarray, binary: bool = True) -> None:
    """Write an (N, 3) cloud as PLY (binary little-endian or ascii)."""
    points = np.asarray(points, dtype=np.float32)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fmt = "binary_little_endian" if binary else "ascii"
    header = (
        "ply\n"
        f"format {fmt} 1.0\n"
        f"element vertex {len(points)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if binary:
            f.write(np.ascontiguousarray(points).tobytes())
        else:
            np.savetxt(f, points, fmt="%.6f")


def read_ply(path: str) -> np.ndarray:
    """Minimal PLY reader for x/y/z float vertices (round-trip of write_ply)."""
    with open(path, "rb") as f:
        binary = False
        n = 0
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("format"):
                binary = "binary" in line
            elif line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line == "end_header":
                break
        if binary:
            return np.frombuffer(f.read(12 * n), dtype=np.float32).reshape(n, 3).copy()
        return np.loadtxt(f, dtype=np.float32, max_rows=n, ndmin=2)
