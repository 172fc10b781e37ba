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


BATCH = int(os.environ.get("ROOF_BATCH", 8))
GATE = 10.0


def main():
    import jax
    import jax.numpy as jnp
    from lidar_slam_arvc_tpu.ops.nn import nn_search
    from lidar_slam_arvc_tpu.ops.nn_pallas import nn_search_pallas
    from lidar_slam_arvc_tpu.ops.nn_pruned import nn_search_pruned

    rng = np.random.default_rng(0)
    # the ICP regime: source = target + small offsets (post-seed residuals),
    # batched BATCH-wide like the fused scanmatcher dispatch
    tgt = jnp.asarray(rng.uniform(-30, 30, (BATCH, T, 3)).astype(np.float32))
    src = tgt[:, :S, :] + jnp.asarray(
        rng.normal(scale=0.3, size=(BATCH, S, 3)).astype(np.float32))
    smask = jnp.ones((BATCH, S), dtype=bool)
    mask = jnp.ones((BATCH, T), dtype=bool)

    # one program per path: REPS dependent sweeps inside a fori_loop so the
    # per-dispatch tunnel latency amortizes out of the per-sweep number;
    # vmapped over BATCH independent chains (throughput, not latency)
    def reps(fn):
        @jax.jit
        def run(src, tgt, mask, smask):
            def one(s0, t, m, sm):
                def body(_, carry):
                    s, acc = carry
                    idx, d2 = fn(s, t, m, sm)
                    # dependency chain: nudge source by a tiny function of
                    # the result so XLA cannot collapse the loop
                    s = s + 1e-12 * d2[:, None]
                    return s, acc + jnp.sum(d2)
                return jax.lax.fori_loop(0, REPS, body, (s0, 0.0))[1]
            return jnp.sum(jax.vmap(one)(src, tgt, mask, smask))
        return run

    interp = jax.devices()[0].platform == "cpu"  # smoke-test mode only
    results = {}
    paths = (
        ("xla", lambda s, t, m, sm: nn_search(s, t, m)),
        ("pallas", lambda s, t, m, sm: nn_search_pallas(
            s, t, m, interpret=interp, impl="vpu")),
        ("pallas_t", lambda s, t, m, sm: nn_search_pallas(
            s, t, m, src_block=2048, tgt_block=1024,
            interpret=interp, impl="vpu_t")),
        ("pallas_mxu", lambda s, t, m, sm: nn_search_pallas(
            s, t, m, interpret=interp, impl="mxu")),
        ("pruned", lambda s, t, m, sm: nn_search_pruned(
            s, sm, t, m, gate=GATE, interpret=interp)),
    )
    for name, fn in paths:
        run = reps(fn)
        np.asarray(run(src, tgt, mask, smask))       # compile + warmup
        t0 = time.time()
        np.asarray(run(src, tgt, mask, smask))
        dt = time.time() - t0
        results[name] = dt / (REPS * BATCH) * 1e3    # ms per sweep

    elems = S * T
    t_vpu = elems * VPU_OPS_PER_ELEMENT / VPU_OPS_PER_S * 1e3
    t_hbm_xla = elems * 8 / HBM_BYTES_PER_S * 1e3  # score tile write+read
    roofline_pallas = t_vpu
    roofline_xla = max(t_vpu, t_hbm_xla)

    print(json.dumps({
        "S": S, "T": T, "reps": REPS, "batch": BATCH,
        "xla_ms": round(results["xla"], 4),
        "pallas_ms": round(results["pallas"], 4),
        "pallas_t_ms": round(results["pallas_t"], 4),
        "pallas_mxu_ms": round(results["pallas_mxu"], 4),
        "pruned_ms": round(results["pruned"], 4),
        "roofline_xla_ms": round(roofline_xla, 4),
        "roofline_pallas_ms": round(roofline_pallas, 4),
        "xla_pct_of_light": round(100 * roofline_xla / results["xla"], 1),
        "pallas_pct_of_light": round(
            100 * roofline_pallas / results["pallas"], 1),
        "pallas_t_pct_of_light": round(
            100 * roofline_pallas / results["pallas_t"], 1),
        "pruned_speedup_vs_pallas": round(
            results["pallas"] / results["pruned"], 2),
    }))


if __name__ == "__main__":
    main()
