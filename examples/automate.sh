#!/usr/bin/env bash
# Batch driver over dataset directories (reference automate.sh parity):
# run both SLAM stages per dataset, then export diagnostics + map artifacts.
set -euo pipefail

PYTHON=${PYTHON:-python}

for directory in "$@"; do
    echo "=== $directory"
    $PYTHON -m lidar_slam_arvc_tpu.pipeline.cli scanmatch -i "$directory"
    $PYTHON -m lidar_slam_arvc_tpu.pipeline.cli graph     -i "$directory"
    $PYTHON -m lidar_slam_arvc_tpu.pipeline.cli view      -i "$directory"
    $PYTHON -m lidar_slam_arvc_tpu.pipeline.cli diag      -i "$directory" \
        > "$directory/robot0/viz/diagnostics.json"
done
