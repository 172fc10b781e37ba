"""Block-shape tuning sweep for the VPU Pallas NN kernel.

Times nn_search_pallas(impl='vpu') at several (src_block, tgt_block) tile
shapes on the bench workload (8192x8192, batch 8) and prints one JSON line
with ms/sweep per configuration.  Used to pick the shipped defaults.

Usage (on the TPU host):
    python benchmarks/nn_block_sweep.py [REPS]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
# env knobs: the shipped default was tuned at 8192^2 (bench config 2);
# NBS_S/NBS_T re-tune for other regimes (e.g. 8192x16384 = capacity 16384
# at source_stride 2, the reference-density config)
S = int(os.environ.get("NBS_S", 8192))
T = int(os.environ.get("NBS_T", 8192))
BATCH = int(os.environ.get("NBS_BATCH", 8))
IMPL = os.environ.get("NBS_IMPL", "vpu")     # vpu | vpu_t (transposed)
CONFIGS = [(512, 1024), (512, 2048), (1024, 1024), (1024, 2048),
           (2048, 2048)]
if os.environ.get("NBS_CONFIGS"):
    CONFIGS = [tuple(int(x) for x in c.split("x"))
               for c in os.environ["NBS_CONFIGS"].split(",")]


def main():
    import jax
    import jax.numpy as jnp
    from lidar_slam_arvc_tpu.ops.nn_pallas import nn_search_pallas

    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.uniform(-30, 30, (BATCH, T, 3)).astype(np.float32))
    src = tgt[:, :S, :] + jnp.asarray(
        rng.normal(scale=0.3, size=(BATCH, S, 3)).astype(np.float32))
    mask = jnp.ones((BATCH, T), dtype=bool)

    def reps(sb, tb):
        @jax.jit
        def run(src, tgt, mask):
            def one(s0, t, m):
                def body(_, carry):
                    s, acc = carry
                    idx, d2 = nn_search_pallas(s, t, m, src_block=sb,
                                               tgt_block=tb, impl=IMPL)
                    s = s + 1e-12 * d2[:, None]
                    return s, acc + jnp.sum(d2)
                return jax.lax.fori_loop(0, REPS, body, (s0, 0.0))[1]
            return jnp.sum(jax.vmap(one)(src, tgt, mask))
        return run

    results = {}
    for sb, tb in CONFIGS:
        run = reps(sb, tb)
        try:
            np.asarray(run(src, tgt, mask))
        except Exception as e:  # VMEM OOM at some tile shapes — skip
            results[f"{sb}x{tb}"] = f"failed: {type(e).__name__}"
            continue
        t0 = time.time()
        np.asarray(run(src, tgt, mask))
        dt = time.time() - t0
        results[f"{sb}x{tb}"] = round(dt / (REPS * BATCH) * 1e3, 4)

    print(json.dumps({"S": S, "T": T, "reps": REPS, "batch": BATCH,
                      "ms_per_sweep": results}))


if __name__ == "__main__":
    main()
