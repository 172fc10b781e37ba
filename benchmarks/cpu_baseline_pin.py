"""Measure the per-pair CPU reference baseline ONCE, in isolation, and pin
it into BASELINE.json.

r4 verdict weak-point 3: bench.py re-timed 3 pairs of the CPU baseline on
every driver run, on a 2-core box that is usually busy — the vs_baseline
denominator swung +-40% between runs (361x vs 257x for identical device
performance).  The honest fix is a pinned constant measured under a stated
protocol; bench.py defaults to it (live re-measure behind
BENCH_LIVE_BASELINE=1).

Protocol (recorded into BASELINE.json):
  - same workload builder as bench.py (12k-point synthetic scans, 0.2 m
    voxels, 30 point-to-plane iterations, 10 m gate)
  - strides 1/2/4 measured (the baseline strides its sources identically
    to the device path so vs_baseline stays apples-to-apples)
  - BASE_PAIRS consecutive pairs per rep, BASE_REPS reps, MIN total time
    per stride (contention-robust), full preprocessing (crop+voxel+normals)
    included in the window
  - MUST run with nothing else on the box; the script warns if load > 0.5

Usage:  python benchmarks/cpu_baseline_pin.py          # updates BASELINE.json
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PAIRS = int(os.environ.get("BASE_PAIRS", 6))
REPS = int(os.environ.get("BASE_REPS", 3))
STRIDES = (1, 2, 4)


def main():
    load1 = os.getloadavg()[0]
    if load1 > 0.5:
        sys.stderr.write(
            f"WARNING: 1-min load average {load1:.2f} — the pinned baseline "
            "must be measured on an idle box; results may be biased low\n")

    # force CPU: the baseline must not touch the device path
    import jax
    jax.config.update("jax_platforms", "cpu")

    os.environ["BENCH_SCANS"] = str(PAIRS + 1)
    import bench

    scans, seeds = bench.build_workload()
    bench.BASELINE_PAIRS = PAIRS
    out = {}
    for stride in STRIDES:
        bench.STRIDE = stride
        best = 0.0
        for _ in range(REPS):
            fps = bench.run_cpu_baseline(scans, seeds)  # PAIRS pairs/rep
            best = max(best, fps)                       # min-time estimator
            sys.stderr.write(f"stride {stride}: {fps:.3f} fps\n")
        out[str(stride)] = round(best, 4)

    path = os.path.join(REPO, "BASELINE.json")
    with open(path) as f:
        data = json.load(f)
    data["cpu_baseline"] = {
        "frames_per_second_by_stride": out,
        "pairs_per_rep": PAIRS,
        "reps": REPS,
        "scan_points": bench.SCAN_POINTS,
        "voxel": bench.VOXEL,
        "icp_iterations": bench.ICP_ITERS,
        "estimator": "min total time over reps, preprocessing included",
        "protocol": "isolated 2-core sandbox host, no concurrent jobs "
                    "(load average checked), scipy cKDTree NN + numpy "
                    "point-to-plane GN — the reference algorithm without "
                    "Open3D's C++ (see BASELINE.md)",
        "load_average_at_measure": round(load1, 3),
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps({"metric": "cpu_baseline_pinned",
                      "frames_per_second_by_stride": out}))


if __name__ == "__main__":
    main()
