"""Measure estimate_normals implementations on the real TPU chip.

Times the fused Pallas ball-moment sweep (ops.ball_moments_pallas) against
the XLA masked-matmul path (ops.radius_accumulate) at the bench.py
preprocess regime: ~8k-point clouds at voxelized (0.2 m) surface density,
vmapped over a batch of scans inside ONE jitted program per variant (per-op
dispatch through the axon tunnel costs ~tens of ms, so eager timing is
meaningless).  Accuracy is checked against a float64 numpy oracle.
Timing forces np.asarray host transfers (block_until_ready returns early
through the tunnel).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from lidar_slam_arvc_tpu import cloud as cl
from lidar_slam_arvc_tpu.ops import smallest_eigenvector_sym3
from lidar_slam_arvc_tpu.ops.moments_pallas import ball_moments_pallas
from lidar_slam_arvc_tpu.cloud.normals import _cov_from_centered

B = int(os.environ.get("NORMALS_B", "8"))        # scans per dispatch
RADIUS = 0.5

# voxelized-density surface: 0.2 m grid over +-9 m, wavy height, off-origin
# (exercises the large-coordinate cancellation the raw-moment path risks)
g = np.arange(-9.0, 9.0, 0.2, dtype=np.float32)
gx, gy = np.meshgrid(g, g)
rng = np.random.default_rng(0)
pts = np.stack([gx.ravel(), gy.ravel(),
                0.5 * np.sin(0.7 * gx.ravel()) * np.cos(0.5 * gy.ravel())],
               axis=1).astype(np.float32)
pts += rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
pts += np.array([25.0, -18.0, 3.0], dtype=np.float32)  # scene offset
c = cl.from_numpy(pts, capacity=8192)
N = c.points.shape[0]
print(f"{int(np.asarray(c.mask).sum())} valid points, capacity {N}, "
      f"batch {B}", flush=True)

bp = jnp.broadcast_to(c.points, (B, N, 3))
bm = jnp.broadcast_to(c.mask, (B, N))


def oracle_normals(p, mask, r):
    p64 = p[mask].astype(np.float64)
    from scipy.spatial import cKDTree
    tree = cKDTree(p64)
    nbrs = tree.query_ball_point(p64, r, workers=-1)
    out = np.zeros_like(p64)
    for i, nb in enumerate(nbrs):
        if len(nb) < 3:
            out[i] = (0, 0, 1)
            continue
        q = p64[nb] - p64[nb].mean(0)
        w, V = np.linalg.eigh(q.T @ q)
        out[i] = V[:, 0]
    return out


ref = oracle_normals(np.asarray(c.points), np.asarray(c.mask), RADIUS)
mask_np = np.asarray(c.mask)


# K back-to-back normal computations chained inside the program (output
# feeds the next iteration's input) so per-dispatch tunnel latency (~13 ms,
# flat across variants at B=8) amortizes over B*K scans
K = int(os.environ.get("NORMALS_K", "16"))


def _norm_xla(pp, mm):
    return cl.estimate_normals(cl.Cloud(pp, mm), RADIUS, impl="xla").normals


def _norm_pallas(pp, mm, qb, tb):
    count, s1, s2 = ball_moments_pallas(pp, pp, mm, RADIUS,
                                        query_block=qb, tgt_block=tb)
    cov = _cov_from_centered(count, s1, s2)
    n = smallest_eigenvector_sym3(cov)
    return jnp.where((count < 3.0)[:, None], jnp.asarray([0.0, 0.0, 1.0]), n)


@functools.partial(jax.jit, static_argnames=("qb", "tb"))
def run(p, m, qb, tb):
    def one(pp, mm):
        def body(_, carry):
            q, last = carry
            n = (_norm_xla(q, mm) if qb == 0
                 else _norm_pallas(q, mm, qb, tb))
            return q + 1e-12 * n, n   # data dependence defeats DCE/CSE
        _, n = jax.lax.fori_loop(0, K, body,
                                 (pp, jnp.zeros_like(pp)))
        return n
    return jax.vmap(one)(p, m)


def timeit_k(qb, tb, label):
    try:
        out = np.asarray(run(bp, bm, qb, tb))
        t0 = time.perf_counter()
        r = run(bp, bm, qb, tb)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / (B * K)
        got = out[0][mask_np]
        dots = np.abs(np.sum(got * ref, axis=1))
        print(f"{label}: {dt*1e3:.3f} ms/scan  "
              f"min|dot|={dots.min():.4f} "
              f"frac>0.99={(dots > 0.99).mean():.4f}", flush=True)
    except Exception as exc:
        print(f"{label}: FAILED {str(exc).splitlines()[0][:140]}", flush=True)


tiles = [(2048, 512), (4096, 512), (1024, 1024)]
if os.environ.get("NORMALS_TILES"):
    tiles = [tuple(int(v) for v in pair.split("x"))
             for pair in os.environ["NORMALS_TILES"].split(",")]
else:
    timeit_k(0, 0, "xla radius_accumulate")
for qb, tb in tiles:
    timeit_k(qb, tb, f"pallas qb={qb} tb={tb}")
