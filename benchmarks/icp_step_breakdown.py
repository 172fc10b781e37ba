"""Per-iteration ICP cost breakdown on TPU.

The NN sweep is measured near VPU speed-of-light (benchmarks/nn_impl_sweep);
this isolates what the REST of an ICP iteration costs — the two
correspondence gathers (tgt[idx], normals[idx]) and the 6x6 point-to-plane
GN step — to decide whether fusing target/normal selection into the Pallas
kernel (returning values instead of indices) can pay.

Times three jitted programs, each REPS iterations over a BATCH of pairs:
  sweep        : NN sweep only
  sweep_gather : + the two row gathers
  full_step    : + GN normal equations, solve, SE(3) retraction

Usage (on the TPU host):
    python benchmarks/icp_step_breakdown.py [REPS]
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
SB, TB = 2048, 1024    # the shipped nn_impl='auto' tile (registration/icp.py)


def main():
    import jax
    import jax.numpy as jnp
    from lidar_slam_arvc_tpu import geom
    from lidar_slam_arvc_tpu.ops.nn_pallas import nn_search_pallas
    from lidar_slam_arvc_tpu.registration.icp import _gn_step_point_to_plane

    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.uniform(-30, 30, (BATCH, T, 3)).astype(np.float32))
    src = tgt[:, :S, :] + jnp.asarray(
        rng.normal(scale=0.3, size=(BATCH, S, 3)).astype(np.float32))
    nrm = rng.normal(size=(BATCH, T, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = jnp.asarray(nrm)
    mask = jnp.ones((BATCH, T), dtype=bool)

    def nn(s, t, m):
        return nn_search_pallas(s, t, m, src_block=SB, tgt_block=TB,
                                impl="vpu_t")

    def make(body_fn):
        @jax.jit
        def run(src, tgt, nrm, mask):
            def one(s0, t, n, m):
                def body(_, carry):
                    s, acc = carry
                    s, acc = body_fn(s, acc, t, n, m)
                    return s, acc
                return jax.lax.fori_loop(0, REPS, body, (s0, 0.0))[1]
            return jnp.sum(jax.vmap(one)(src, tgt, nrm, mask))
        return run

    def sweep(s, acc, t, n, m):
        idx, d2 = nn(s, t, m)
        return s + 1e-12 * d2[:, None], acc + jnp.sum(d2)

    def sweep_gather(s, acc, t, n, m):
        idx, d2 = nn(s, t, m)
        q = t[idx]
        nc = n[idx]
        return s + 1e-12 * d2[:, None], acc + jnp.sum(q) + jnp.sum(nc)

    def full_step(s, acc, t, n, m):
        idx, d2 = nn(s, t, m)
        w = (d2 <= 100.0).astype(s.dtype)
        q = t[idx]
        nc = n[idx]
        H, b, _ = _gn_step_point_to_plane(s, nc, q, w)
        damp = 1e-6 * (jnp.trace(H) / 6.0 + 1.0)
        xi = jnp.linalg.solve(H + damp * jnp.eye(6, dtype=H.dtype), b)
        xi = 1e-9 * xi  # keep the cloud in place so timing stays stationary
        Tm = geom.se3_exp(xi)
        return geom.transform_points(Tm, s), acc + jnp.sum(xi)

    results = {}
    for name, fn in [("sweep", sweep), ("sweep_gather", sweep_gather),
                     ("full_step", full_step)]:
        run = make(fn)
        np.asarray(run(src, tgt, nrm, mask))      # compile + warmup
        t0 = time.time()
        np.asarray(run(src, tgt, nrm, mask))
        results[name] = round((time.time() - t0) / (REPS * BATCH) * 1e3, 4)
        sys.stderr.write(f"{name}: {results[name]} ms/iter\n")
    print(json.dumps({"S": S, "T": T, "reps": REPS, "batch": BATCH,
                      "ms_per_iter": results}))


if __name__ == "__main__":
    main()
