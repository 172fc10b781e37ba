"""Speed-of-light check for the nearest-neighbor sweep kernels.

Times the exact NN sweep (XLA tiled formulation vs fused Pallas kernel) at
the bench workload size and compares against the analytic roofline of a
TPU v5e core:

  * the distance matmul contracts over only 3 coordinates, so the MXU time
    is negligible; the sweep is bound by the VPU work on the (S, T) score
    tile: ~4 vector ops per score element (fused multiply-add unrolls into
    the matmul; min+argmin = compare/select pairs).
  * v5e VPU: 8x128 lanes x 4 ALUs x ~0.94 GHz ~= 3.9 Top/s (f32).
  * XLA formulation additionally round-trips the (S, T) f32 score tiles
    through HBM (write + read ~= 8 bytes/element at ~820 GB/s).

Usage (on the TPU host):
    python benchmarks/nn_roofline.py [S] [T] [REPS]

Prints one JSON line with measured ms/sweep for both paths and their
percent-of-roofline.  Timing forces host transfers (np.asarray) because
block_until_ready is unreliable through remote-execution backends.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
T = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 30

VPU_OPS_PER_S = 3.9e12     # v5e: 8x128 lanes * 4 ALUs * ~0.94 GHz
HBM_BYTES_PER_S = 820e9    # v5e HBM bandwidth
VPU_OPS_PER_ELEMENT = 4.0  # sub+scale fold into compare/select chains


def main():
    import jax
    import jax.numpy as jnp
    from lidar_slam_arvc_tpu.ops.nn import nn_search
    from lidar_slam_arvc_tpu.ops.nn_pallas import nn_search_pallas

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(-30, 30, (S, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-30, 30, (T, 3)).astype(np.float32))
    mask = jnp.ones((T,), dtype=bool)

    # one program per path: REPS dependent sweeps inside a fori_loop so the
    # per-dispatch tunnel latency amortizes out of the per-sweep number
    def reps(fn):
        @jax.jit
        def run(src, tgt, mask):
            def body(_, carry):
                s, acc = carry
                idx, d2 = fn(s, tgt, mask)
                # dependency chain: nudge source by a tiny function of the
                # result so XLA cannot collapse the loop
                s = s + 1e-12 * d2[:, None]
                return s, acc + jnp.sum(d2)
            out = jax.lax.fori_loop(0, REPS, body, (src, 0.0))
            return out[1]
        return run

    interp = jax.devices()[0].platform == "cpu"  # smoke-test mode only
    results = {}
    for name, fn in (("xla", lambda s, t, m: nn_search(s, t, m)),
                     ("pallas", lambda s, t, m: nn_search_pallas(
                         s, t, m, interpret=interp))):
        run = reps(fn)
        np.asarray(run(src, tgt, mask))       # compile + warmup
        t0 = time.time()
        np.asarray(run(src, tgt, mask))
        dt = time.time() - t0
        results[name] = dt / REPS * 1e3       # ms per sweep

    elems = S * T
    t_vpu = elems * VPU_OPS_PER_ELEMENT / VPU_OPS_PER_S * 1e3
    t_hbm_xla = elems * 8 / HBM_BYTES_PER_S * 1e3  # score tile write+read
    roofline_pallas = t_vpu
    roofline_xla = max(t_vpu, t_hbm_xla)

    print(json.dumps({
        "S": S, "T": T, "reps": REPS,
        "xla_ms": round(results["xla"], 4),
        "pallas_ms": round(results["pallas"], 4),
        "roofline_xla_ms": round(roofline_xla, 4),
        "roofline_pallas_ms": round(roofline_pallas, 4),
        "xla_pct_of_light": round(100 * roofline_xla / results["xla"], 1),
        "pallas_pct_of_light": round(
            100 * roofline_pallas / results["pallas"], 1),
    }))


if __name__ == "__main__":
    main()
