"""Formulation + tile-shape sweep for the Pallas NN kernels.

Times nn_search_pallas across distance formulations (vpu / vpu2 / vpu_t —
see ops/nn_pallas.py) and tile shapes on the bench workload (8192x8192,
batch 8) and prints one JSON line with ms/sweep per configuration.  Used to
pick the shipped default (registration/icp.py nn_impl='auto').

Usage (on the TPU host):
    python benchmarks/nn_impl_sweep.py [REPS]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
S = T = 8192
BATCH = 8
# (impl, src_block, tgt_block).  Round 1 measurements (TPU v5e, ms/sweep):
#   vpu_512x2048 0.4456 | vpu2_512x2048 0.4401 | vpu_t_512x2048 0.3299
#   vpu2_512x4096 0.3613 | vpu2_256x2048 0.4649 | vpu_t_1024x2048 0.3114
# -> transposed sublane-reduction formulation wins; shape sweep below.
CONFIGS = [
    ("vpu_t", 1024, 2048),   # best of round 1
    ("vpu_t", 1024, 4096),
    ("vpu_t", 2048, 2048),
    ("vpu_t", 2048, 1024),
    ("vpu_t", 1024, 1024),
    ("vpu_t", 1024, 8192),   # whole target in one tile: no cross-tile best
]


def main():
    import jax
    import jax.numpy as jnp
    from lidar_slam_arvc_tpu.ops.nn_pallas import nn_search_pallas

    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.uniform(-30, 30, (BATCH, T, 3)).astype(np.float32))
    src = tgt[:, :S, :] + jnp.asarray(
        rng.normal(scale=0.3, size=(BATCH, S, 3)).astype(np.float32))
    mask = jnp.ones((BATCH, T), dtype=bool)

    def reps(impl, sb, tb):
        @jax.jit
        def run(src, tgt, mask):
            def one(s0, t, m):
                def body(_, carry):
                    s, acc = carry
                    idx, d2 = nn_search_pallas(s, t, m, src_block=sb,
                                               tgt_block=tb, impl=impl)
                    s = s + 1e-12 * d2[:, None]
                    return s, acc + jnp.sum(d2)
                return jax.lax.fori_loop(0, REPS, body, (s0, 0.0))[1]
            return jnp.sum(jax.vmap(one)(src, tgt, mask))
        return run

    results = {}
    for impl, sb, tb in CONFIGS:
        key = f"{impl}_{sb}x{tb}"
        run = reps(impl, sb, tb)
        try:
            np.asarray(run(src, tgt, mask))          # compile + warmup
        except Exception as e:
            results[key] = f"failed: {type(e).__name__}"
            sys.stderr.write(f"{key}: {e}\n")
            continue
        t0 = time.time()
        np.asarray(run(src, tgt, mask))
        results[key] = round((time.time() - t0) / (REPS * BATCH) * 1e3, 4)
        sys.stderr.write(f"{key}: {results[key]} ms/sweep\n")
    print(json.dumps({"S": S, "T": T, "reps": REPS, "batch": BATCH,
                      "ms_per_sweep": results}))


if __name__ == "__main__":
    main()
