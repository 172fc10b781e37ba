"""Pallas TPU kernel for ball-neighborhood moments (normal estimation).

Fuses the distance sweep and the moment accumulation of
ops.nn.radius_accumulate into one kernel: the (Q, T) weight matrix lives
only in VMEM/registers and the ten per-query accumulators (count, first
and second moments) carry across target tiles in VMEM scratch.  This is
the TPU replacement for the neighbor-gathering half of Open3D's C++
``estimate_normals`` (reference keyframemanager/keyframe.py:160-162) —
the other half, the smallest-eigenvector solve, stays in ops.eigh3.

Two deliberate differences from the XLA radius_accumulate path:

  * Layout is transposed like ops.nn_pallas 'vpu_t' — queries on lanes,
    targets on sublanes — so every reduction (count and the nine moment
    sums) is a sublane reduction, and the accumulator rows broadcast
    against (BT, BQ) tiles with no relayout.
  * Moments are **query-centered**: S1 = sum w (t - q), S2 = sum of the
    upper triangle of w (t - q)(t - q)^T.  The deltas are already
    computed for the distance test, the extra products are pure VPU f32,
    and the covariance  S2/n - m m^T  (m = S1/n) is formed from values of
    magnitude ~radius instead of ~|scene|, removing the catastrophic
    cancellation the raw-moment formulation tolerates only at
    Precision.HIGHEST.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidar_slam_arvc_tpu.ops.nn_pruned import _block_boxes, _box_dist2

# Masked targets are moved to this far sentinel (see ops.nn_pallas): their
# distance to any terrestrial query exceeds ~1.6e15 m^2, so the ball test
# w = (d2 <= r^2) excludes them with no separate penalty stream.
_SENT = -4e7


def _ball_kernel(r2: float, tile_d2_ref, qT_ref, tgt_ref, out_ref, acc):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    # Tile skip: tile_d2[i, j] lower-bounds every pair distance between
    # query block i and target block j (axis-aligned bbox gap).  If the
    # bound exceeds the ball radius no pair in the tile can be a neighbor.
    # Unlike the NN prune (nn_pruned.py) this is a STATIC radius test, so
    # correctness never depends on point ordering — ordering only sets the
    # skip rate, and voxel-downsampled clouds arrive voxel-key-sorted
    # (spatially compact slabs) for free.
    @pl.when(tile_d2_ref[i, j] <= r2)
    def _():
        # (BT, 1) - (1, BQ) lane-broadcasts: pure VPU, exact f32
        dx = tgt_ref[:, 0:1] - qT_ref[0:1, :]
        dy = tgt_ref[:, 1:2] - qT_ref[1:2, :]
        dz = tgt_ref[:, 2:3] - qT_ref[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz
        w = (d2 <= r2).astype(jnp.float32)            # (BT, BQ)

        # Each product tile is consumed by its sublane reduction immediately
        # so at most ~6 (BT, BQ) temporaries are live (dx/dy/dz/w +
        # transients); materializing all ten products at once OOMs scoped
        # VMEM at useful tile sizes.  The extra w*·· recomputations are
        # single VPU muls.
        def s(r):
            return jnp.sum(r, axis=0, keepdims=True)  # (1, BQ)

        sums = jnp.concatenate(
            [s(w),
             s(w * dx), s(w * dy), s(w * dz),
             s(w * (dx * dx)), s(w * (dx * dy)), s(w * (dx * dz)),
             s(w * (dy * dy)), s(w * (dy * dz)),
             s(w * (dz * dz)),
             # pad to the full 16-sublane scratch so the update is a
             # whole-tile add (no sub-8 sublane slicing)
             jnp.zeros((6, w.shape[1]), jnp.float32)], axis=0)      # (16,BQ)
        acc[:] = acc[:] + sums

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc[:]


@functools.partial(
    jax.jit,
    static_argnames=("radius", "query_block", "tgt_block", "interpret"))
def ball_moments_pallas(query: jax.Array, tgt: jax.Array, tgt_mask: jax.Array,
                        radius: float, query_block: int = 1024,
                        tgt_block: int = 512, interpret: bool = False,
                        query_mask: jax.Array | None = None):
    """Query-centered ball moments for every query point.

    Args:
      query: (Q, 3) query points (padded rows produce garbage the caller
        must gate with its own mask).
      tgt: (T, 3) candidate neighbors.
      tgt_mask: (T,) validity; masked rows never count as neighbors.
      radius: ball radius (static — baked into the kernel).
      query_mask: (Q,) optional validity; only tightens the per-block
        bboxes that drive tile skipping (garbage rows widen them).

    Tiles whose block-bbox gap exceeds ``radius`` are skipped inside the
    kernel (no pair in them can be a neighbor — exact, independent of
    point order).  Point ORDER sets the skip rate: voxel-downsampled
    clouds arrive voxel-key-sorted, so consecutive blocks are spatially
    compact slabs and most tiles skip at LiDAR normal-estimation radii.

    Block defaults (1024, 512) measured fastest on TPU v5e with tile
    skipping at voxelized density: 0.58 ms per 8192^2 sweep vs 0.60/0.63
    at (512, 512)/(512, 1024) and 0.74 at (1024, 1024) — finer target
    blocks skip a larger fraction of tiles (benchmarks/normals_impl_sweep
    .py; the XLA raw-moment matmul path measures 1.38-1.46: the MXU
    absorbs its 42x padding waste, so the fused kernel's win is VMEM
    traffic + skipping, not FLOPs).
    Returns:
      (count (Q,), S1 (Q, 3), S2 (Q, 6)) — neighbor count, sums of
      (t - q) and of the upper triangle (xx,xy,xz,yy,yz,zz) of
      (t - q)(t - q)^T over neighbors within ``radius`` (self included
      when the query is a valid target, at delta 0).
    """
    Q = query.shape[0]
    T = tgt.shape[0]
    pad_q = (-Q) % query_block
    pad_t = (-T) % tgt_block
    q_p = jnp.pad(query, ((0, pad_q), (0, 0)))
    tgt_p = jnp.pad(tgt, ((0, pad_t), (0, 0)))
    mask_p = jnp.pad(tgt_mask, (0, pad_t))
    if query_mask is None:
        q_mask_p = jnp.pad(jnp.ones(Q, dtype=bool), (0, pad_q))
    else:
        q_mask_p = jnp.pad(query_mask, (0, pad_q))

    Qp = q_p.shape[0]
    Tp = tgt_p.shape[0]
    grid = (Qp // query_block, Tp // tgt_block)
    mem = pl.ANY if interpret else pltpu.VMEM

    qT = jnp.pad(q_p.T, ((0, 5), (0, 0)))                        # (8, Qp)
    tgt_sent = jnp.where(mask_p[:, None], tgt_p, _SENT)          # (Tp, 3)

    # per-tile lower bound on any pair distance (empty blocks -> +BIG)
    qlo, qhi = _block_boxes(q_p, q_mask_p, query_block)
    tlo, thi = _block_boxes(tgt_p, mask_p, tgt_block)
    tile_d2 = _box_dist2(qlo, qhi, tlo, thi)            # (n_i, n_j)

    r2 = float(radius) ** 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # tile_d2
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, query_block), lambda i, j, td: (0, i),
                         memory_space=mem),
            pl.BlockSpec((tgt_block, 3), lambda i, j, td: (j, 0),
                         memory_space=mem),
        ],
        out_specs=pl.BlockSpec((16, query_block), lambda i, j, td: (0, i),
                               memory_space=mem),
        scratch_shapes=[pltpu.VMEM((16, query_block), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_ball_kernel, r2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, Qp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # ~6 (BT, BQ) f32 temporaries are live at the accumulation
            # point; the 16 MB default scoped-vmem limit only fits tiny
            # tiles, while v5e has 128 MB of physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not interpret else None,
        interpret=interpret,
    )(tile_d2, qT, tgt_sent)

    return out[0, :Q], out[1:4, :Q].T, out[4:10, :Q].T
