"""Speed-of-light check for the pose-graph LM step kernel.

Times one full Levenberg-Marquardt step of the batch solver
(`graph/solver.py:_lm_step` — residuals/Jacobians, dense (6N,6N) normal-
equation assembly, damped Cholesky solve, SE(3) retraction, cost) at
representative graph sizes, and compares against the analytic roofline of
the dominant kernel, the dense Cholesky factorization:

  * Cholesky of an M x M system (M = 6N) costs ~M^3/3 FMA = 2/3 M^3 flops.
    The solve itself adds 2 triangular solves (~2 M^2 flops, negligible).
  * The MXU executes these in f32 (geometry requires Precision.HIGHEST;
    f32 on v5e MXU ~= 1/4 of the 197 Tflop/s bf16 rate ~= 49 Tflop/s).
  * Assembly is E scatter-adds of 6x6 blocks into the (M, M) matrix —
    HBM-bound on writing the dense H (~4 M^2 bytes at ~820 GB/s); it
    matters only at small N where the Cholesky is cheap.

The reference's analogue is GTSAM ISAM2's incremental Bayes-tree update
(graphSLAM.py:102-105); we batch re-solve at the same cadence, so ms/step
here is directly the per-`optimize()` device cost.

For the matrix-free PCG step (graph/pcg.py:pcg_lm_step, the beyond-1024-pose
solver) pass SOLVER=pcg: its per-step cost is max_cg_iters edge-sweeps of
O(E) 6x6 block products — HBM-bound on re-reading the (E,6,6) Jacobian
blocks each CG iteration — so the roofline reported is the CG-sweep memory
bound, not the Cholesky flop bound.

Usage (on the TPU host):
    python benchmarks/graph_roofline.py [N_POSES] [REPS] [SOLVER]

SOLVER: dense (default; chain-partitioned band assembly — the production
configuration) | dense_scatter (the r4 all-scatter assembly, for A/B) |
pcg | breakdown (times residuals/assembly/damping/Cholesky/retraction
separately to locate the dense step's true bound).
Prints one JSON line with measured ms/step and percent-of-roofline.
Timing forces host transfers (np.asarray) because block_until_ready is
unreliable through remote-execution backends.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_POSES = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
SOLVER = sys.argv[3] if len(sys.argv) > 3 else "dense"
MAX_CG_ITERS = 100
LOOP_EVERY = 40          # one loop-closure edge per this many poses

MXU_F32_FLOPS = 49e12    # v5e: 197 Tflop/s bf16 / 4 for f32 accumulate paths
HBM_BYTES_PER_S = 820e9


def build_graph(n):
    """Synthetic SLAM-shaped graph: odometry chain + SM chain + sparse
    loop closures + GPS every 5 poses + prior on pose 0 (the regime of
    run_graphSLAM.py:229-268)."""
    from lidar_slam_arvc_tpu.graph import PoseGraph
    from lidar_slam_arvc_tpu.utils import synthetic

    T = synthetic.make_trajectory(n, radius=max(8.0, n / 40.0))
    rng = np.random.default_rng(0)

    # explicit partition (r5): 2n chain slots band-assembled scatter-free,
    # loop budget scaling with n (n//LOOP_EVERY+1 actual loop edges) —
    # total capacity comparable to the r4 configuration (2072+ at 1024)
    loop_cap = n // LOOP_EVERY + 64
    g = PoseGraph(T0=T[0], max_poses=n, max_between=2 * n + loop_cap,
                  chain_capacity=2 * n, max_gps=n // 5 + 1)
    g.init_graph()
    for i in range(n - 1):
        rel = np.linalg.inv(T[i]) @ T[i + 1]
        noisy = rel.copy()
        noisy[:3, 3] += rng.normal(scale=0.01, size=3)
        g.add_initial_estimate(noisy, i + 1)
        g.add_edge(noisy, i, i + 1, "SM")
        g.add_edge(rel, i, i + 1, "ODO")
    for k in range(1, n // LOOP_EVERY + 1):
        i, j = 0, min(k * LOOP_EVERY, n - 1)
        g.add_edge(np.linalg.inv(T[i]) @ T[j], i, j, "SM")
    for i in range(0, n, 5):
        g.add_gps_factor(T[i][0, 3], T[i][1, 3], T[i][2, 3], i)
    return g


def main():
    import jax
    import jax.numpy as jnp
    from lidar_slam_arvc_tpu.graph.solver import _lm_step
    from lidar_slam_arvc_tpu.graph.pcg import pcg_lm_step

    g = build_graph(N_POSES)
    poses = jnp.asarray(g.poses)
    factors = g._factor_data()
    n_active = jnp.asarray(g.n_poses, dtype=jnp.int32)

    if SOLVER == "breakdown":
        return breakdown(poses, factors, n_active, g.chain_capacity)
    if SOLVER == "pcg":
        step = lambda p: pcg_lm_step(p, factors, n_active,
                                     jnp.float32(1e-6),
                                     max_cg_iters=MAX_CG_ITERS)
    else:
        # 'dense' = the production configuration (chain-partitioned band
        # assembly); 'dense_scatter' = the r4 all-scatter formulation
        cc = 0 if SOLVER == "dense_scatter" else g.chain_capacity
        step = lambda p: _lm_step(p, factors, n_active, jnp.float32(1e-6),
                                  cc)

    # REPS dependent steps inside one program so per-dispatch tunnel latency
    # amortizes out; each step feeds the next (a genuine LM iteration chain).
    @jax.jit
    def run(poses):
        def body(_, carry):
            p, acc = carry
            p2, cost = step(p)
            return p2, acc + cost
        return jax.lax.fori_loop(0, REPS, body, (poses, 0.0))

    out = run(poses)                       # compile + warmup
    np.asarray(out[1])
    _time_main(run, poses, factors)


def breakdown(poses, factors, n_active, chain_capacity=0):
    """Time the pieces of the dense LM step as separate fori-chained
    programs: where do the 14.8 ms/step at 1024 poses actually go?"""
    import jax
    import jax.numpy as jnp
    from lidar_slam_arvc_tpu.graph.solver import (
        _assemble, _lm_step, graph_cost)

    H0, b0 = _assemble(poses, factors, n_active, chain_capacity)
    lam = jnp.float32(1e-6)

    def chain(fn, x0, *consts):
        """REPS dependent applications of fn inside one program.

        Large arrays MUST be passed as arguments (consts), not closed
        over: a closed-over concrete jax.Array becomes a program literal
        and a (6N)^2 H matrix blows the remote-compile request size.
        """
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

    # each piece perturbed by its own output so the loop carries a data dep
    t_asm = chain(lambda c, p: _assemble(p + 1e-12 * c[1][0], factors,
                                         n_active, chain_capacity)[0:2],
                  (H0, b0), poses)

    def chol_piece(c, H):
        eyeM = jnp.eye(H.shape[0], dtype=H.dtype)
        damped = (H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * eyeM
                  + 1e-12 * c[0][0, 0] * eyeM)
        return jax.scipy.linalg.cho_factor(damped, lower=True)
    F0 = jax.scipy.linalg.cho_factor(
        H0 + 1e-9 * jnp.eye(H0.shape[0], dtype=H0.dtype), lower=True)
    t_chol = chain(chol_piece, F0, H0)

    t_cost = chain(lambda c, p: (graph_cost(p + 1e-12 * c, factors)
                                 * jnp.ones_like(p)), poses, poses)
    t_full = chain(lambda c, p: _lm_step(p + 1e-12 * c[0], factors,
                                         n_active, lam, chain_capacity),
                   (poses, jnp.float32(0.0)), poses)
    M = poses.shape[0] * 6
    print(json.dumps({
        "solver": "breakdown", "n_poses": N_POSES, "reps": REPS,
        "assemble_ms": round(t_asm, 3),
        "cholesky_ms": round(t_chol, 3),
        "cost_ms": round(t_cost, 3),
        "full_step_ms": round(t_full, 3),
        "chol_roofline_ms": round((2/3) * M**3 / MXU_F32_FLOPS * 1e3, 3),
        "assemble_roofline_ms": round(4.0 * M * M / HBM_BYTES_PER_S * 1e3, 3),
    }))


def _time_main(run, poses, factors):
    import numpy as np  # noqa: F811 (shadow for clarity)
    t0 = time.time()
    out = run(poses)
    np.asarray(out[1])
    dt = time.time() - t0
    ms_per_step = dt / REPS * 1e3

    M = N_POSES * 6
    n_edges = int(np.asarray(factors.bt_i).shape[0])
    if SOLVER == "pcg":
        # each CG iteration re-reads the (E,6,6) A/B blocks + (N,6,6)
        # preconditioner + a handful of (N,6) vectors: ~2*E*36*4*2 bytes.
        # NOTE: with the tridiagonal preconditioner the apply is two
        # N-step scans of 6x6 ops — LATENCY-bound, not bandwidth-bound —
        # and CG usually exits in far fewer than MAX_CG_ITERS iterations,
        # so this bound is loose in both directions; treat ms_per_lm_step
        # as the ground truth and pct_of_light as indicative only.
        bytes_per_cg = (2 * n_edges * 36 * 4 * 2 + N_POSES * 36 * 4
                        + 6 * N_POSES * 6 * 4)
        roofline_ms = MAX_CG_ITERS * bytes_per_cg / HBM_BYTES_PER_S * 1e3
    else:
        chol_flops = (2.0 / 3.0) * M ** 3
        t_chol = chol_flops / MXU_F32_FLOPS * 1e3
        t_assemble = 4.0 * M * M / HBM_BYTES_PER_S * 1e3  # write dense H once
        roofline_ms = t_chol + t_assemble

    print(json.dumps({
        "solver": SOLVER,
        "n_poses": N_POSES, "n_between": n_edges, "reps": REPS,
        "ms_per_lm_step": round(ms_per_step, 3),
        "roofline_ms": round(roofline_ms, 3),
        "pct_of_light": round(100 * roofline_ms / ms_per_step, 1),
        "steps_per_s": round(1e3 / ms_per_step, 1),
        **({"max_cg_iters": MAX_CG_ITERS} if SOLVER == "pcg" else {}),
    }))


if __name__ == "__main__":
    main()
