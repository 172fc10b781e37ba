"""Probe: PCG step cost split at large N — tridiag-scan apply vs edge sweep.

The block-tridiagonal preconditioner apply is two lax.scans of N sequential
6x6 steps (latency-bound); the Hx operator is a batched edge sweep
(bandwidth-bound).  This decides whether a log-depth cyclic-reduction
preconditioner is worth building.

Usage: python benchmarks/pcg_probe.py [N_POSES] [REPS]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_POSES = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def main():
    import jax
    import jax.numpy as jnp
    from benchmarks.graph_roofline import build_graph
    from lidar_slam_arvc_tpu.graph.pcg import (
        _apply_tridiag_precond, _build_tridiag_precond, _hx, _linearize)

    g = build_graph(N_POSES)
    poses = jnp.asarray(g.poses)
    factors = g._factor_data()
    n_active = jnp.asarray(g.n_poses, dtype=jnp.int32)
    lam = jnp.float32(1e-6)

    lin, idx = _linearize(poses, factors, n_active)
    Uinv, W, E = _build_tridiag_precond(lin, factors, lam)
    b = jnp.ones((N_POSES, 6), jnp.float32)

    def chain(fn, x0, *consts):
        @jax.jit
        def run(x, *cs):
            def body(_, c):
                return fn(c, *cs)
            return jax.lax.fori_loop(0, REPS, body, x)
        out = run(x0, *consts)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.time()
        out = run(x0, *consts)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (time.time() - t0) / REPS * 1e3

    t_apply = chain(lambda x, u, w, e: _apply_tridiag_precond(u, w, e, x),
                    b, Uinv, W, E)
    t_hx = chain(lambda x: _hx(lin, idx, x, lam), b)
    t_build = chain(lambda c: _build_tridiag_precond(
        lin, factors, lam + 1e-12 * c[0][0, 0, 0]), (Uinv, W, E))
    print(json.dumps({
        "n_poses": N_POSES, "reps": REPS,
        "tridiag_apply_ms": round(t_apply, 3),
        "hx_ms": round(t_hx, 3),
        "tridiag_build_ms": round(t_build, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
