"""Distance-adaptive pruned NN sweep (Pallas TPU kernel).

The exhaustive sweep (ops/nn_pallas.py) scores every (source, target) pair.
For gated ICP correspondence (the reference's 10 m gate,
config/icp_parameters.yaml:20-22) most of that work is provably irrelevant:
once a source point has a candidate at distance d, no target tile whose
bounding box lies farther than d can change the result.

This kernel exploits that with three XLA-side preparations per call:

  1. both clouds are sorted by a 2-D Morton key so fixed-size point blocks
     are spatially compact;
  2. per-block axis-aligned bounding boxes give a lower bound
     ``tile_d2[i, k]`` on the squared distance between source block i and
     target block k (clamped to +BIG beyond the gate — those tiles can never
     produce an accepted correspondence);
  3. per source block, target blocks are visited nearest-first via a
     scalar-prefetched permutation that drives the target BlockSpec index
     map (pltpu.PrefetchScalarGridSpec).

Inside the kernel the per-row best distances carry across target tiles in
VMEM scratch (like the exhaustive kernel); a tile is skipped with pl.when
when its bound exceeds the worst current best in the block, i.e. when it
cannot improve any row.  Because tiles arrive nearest-first, the block
settles after the first few tiles and the remaining grid steps cost only
the bound comparison.

Contract: EXACT nearest neighbor for every source row whose true NN lies
within ``gate``; rows with no target inside the gate return d2 > gate^2
(which gated ICP discards either way).  This is weaker than
nn_search/nn_search_pallas (exact everywhere) — use it only with a gate,
as ICP does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e12
_NEG = -1e12


def _morton_xy(points: jax.Array, valid: jax.Array) -> jax.Array:
    """8-bit-per-axis interleaved xy key; invalid points sort to the end."""
    lo = jnp.min(jnp.where(valid[:, None], points, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], points, -jnp.inf), axis=0)
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((points - lo) / span * 255.0, 0.0, 255.0).astype(jnp.int32)

    def spread(v):  # 8 bits -> even bit positions of 16
        v = (v | (v << 4)) & 0x0F0F
        v = (v | (v << 2)) & 0x3333
        v = (v | (v << 1)) & 0x5555
        return v

    key = (spread(q[:, 1]) << 1) | spread(q[:, 0])
    return jnp.where(valid, key, jnp.int32(0x7FFFFFFF))


def _block_boxes(points: jax.Array, valid: jax.Array, block: int):
    """(B, 3) lo / hi per block of ``block`` consecutive points."""
    n = points.shape[0] // block
    p = points.reshape(n, block, 3)
    v = valid.reshape(n, block, 1)
    lo = jnp.min(jnp.where(v, p, jnp.inf), axis=1)
    hi = jnp.max(jnp.where(v, p, -jnp.inf), axis=1)
    return lo, hi


def _box_dist2(lo_a, hi_a, lo_b, hi_b):
    """(A, B) min squared distance between all box pairs (inf for empties)."""
    gap = jnp.maximum(
        jnp.maximum(lo_b[None, :, :] - hi_a[:, None, :],
                    lo_a[:, None, :] - hi_b[None, :, :]), 0.0)
    # an empty block has lo=+inf/hi=-inf: gap=inf, d2=inf (never visited
    # before real tiles, always skippable)
    return jnp.sum(jnp.where(jnp.isfinite(gap), gap, _BIG) ** 2, axis=-1)


def _pruned_kernel(perm_ref, tiled2_ref, src_ref, svalid_ref, tgt_ref,
                   t2_ref, out_d2_ref, out_idx_ref, best, best_idx, s2):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        s2[:] = jnp.sum(src_ref[:] * src_ref[:], axis=1, keepdims=True)
        # invalid source rows start settled so they never block skipping
        best[:] = jnp.where(svalid_ref[:] > 0, jnp.inf, _NEG)
        best_idx[:] = jnp.zeros_like(best_idx)

    # worst outstanding true distance in this source block; a tile whose
    # box bound exceeds it cannot improve any row
    bound = jnp.max(best[:] + s2[:])

    @pl.when(tiled2_ref[i, j] <= bound)
    def _():
        cross = jax.lax.dot_general(
            src_ref[:], tgt_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        score = t2_ref[:] - 2.0 * cross
        tile_min = jnp.min(score, axis=1, keepdims=True)
        tile_arg = jnp.argmin(score, axis=1).astype(jnp.int32)[:, None]
        tile_arg = tile_arg + perm_ref[i, j] * score.shape[1]
        better = tile_min < best[:]
        best[:] = jnp.where(better, tile_min, best[:])
        best_idx[:] = jnp.where(better, tile_arg, best_idx[:])

    @pl.when(j == n_j - 1)
    def _():
        out_d2_ref[:] = jnp.maximum(best[:] + s2[:], 0.0)
        out_idx_ref[:] = best_idx[:]


def morton_sort(points: jax.Array, mask: jax.Array, block: int = 512):
    """(points_sorted, mask_sorted, order): pad to a block multiple and sort
    by Morton xy so fixed blocks are spatially compact.

    Meant to be hoisted OUT of the ICP iteration loop: the target cloud is
    fixed, and a rigid transform preserves relative locality exactly, so
    sorting the source once by its seed-transformed positions keeps every
    block compact through all iterations.
    """
    n = points.shape[0]
    pad = (-n) % block
    p = jnp.pad(points, ((0, pad), (0, 0)))
    m = jnp.pad(mask, (0, pad))
    order = jnp.argsort(_morton_xy(p, m))
    return p[order], m[order], order


@functools.partial(
    jax.jit, static_argnames=("gate", "src_block", "tgt_block", "interpret"))
def nn_search_pruned_presorted(ss: jax.Array, sv: jax.Array, ts: jax.Array,
                               tv: jax.Array, gate: float,
                               src_block: int = 512, tgt_block: int = 512,
                               interpret: bool = False):
    """Pruned sweep over clouds already morton_sort-ed (and block-padded).
    Returns (idx into ts, d2) in ss row order.  Per-call prep is only the
    block bboxes and a tiny (n_i, n_j) per-row argsort."""
    slo, shi = _block_boxes(ss, sv, src_block)
    tlo, thi = _block_boxes(ts, tv, tgt_block)
    d2 = _box_dist2(slo, shi, tlo, thi)                      # (n_i, n_tgt)
    d2 = jnp.where(d2 > gate * gate, _BIG, d2)               # gate pre-prune
    perm = jnp.argsort(d2, axis=1).astype(jnp.int32)         # nearest-first
    tile_d2 = jnp.take_along_axis(d2, perm, axis=1)

    t2 = (jnp.sum(ts * ts, axis=-1)
          + jnp.where(tv, 0.0, _BIG))[None, :]               # (1, Tp)

    n_i = ss.shape[0] // src_block
    n_j = ts.shape[0] // tgt_block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # perm, tile_d2
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((src_block, 3), lambda i, j, perm, td: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((src_block, 1), lambda i, j, perm, td: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((tgt_block, 3),
                         lambda i, j, perm, td: (perm[i, j], 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, tgt_block),
                         lambda i, j, perm, td: (0, perm[i, j]),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((src_block, 1), lambda i, j, perm, td: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((src_block, 1), lambda i, j, perm, td: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((src_block, 1), jnp.float32),
            pltpu.VMEM((src_block, 1), jnp.int32),
            pltpu.VMEM((src_block, 1), jnp.float32),
        ],
    )

    d2_s, idx_s = pl.pallas_call(
        _pruned_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ss.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((ss.shape[0], 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ) if not interpret else None,
        interpret=interpret,
    )(perm, tile_d2, ss, sv[:, None].astype(jnp.float32), ts, t2)
    return jnp.clip(idx_s[:, 0], 0, ts.shape[0] - 1), d2_s[:, 0]


@functools.partial(
    jax.jit, static_argnames=("gate", "src_block", "tgt_block", "interpret"))
def nn_search_pruned(src: jax.Array, src_mask: jax.Array, tgt: jax.Array,
                     tgt_mask: jax.Array, gate: float,
                     src_block: int = 512, tgt_block: int = 512,
                     interpret: bool = False):
    """(idx, d2): exact NN for rows whose NN is within ``gate`` (see module
    docstring), in the callers' original point order.  Invalid source rows
    return arbitrary values — mask them.  When calling repeatedly on the
    same clouds (ICP iterations) prefer morton_sort once +
    nn_search_pruned_presorted to hoist the two big argsorts."""
    S, T = src.shape[0], tgt.shape[0]
    ss, sv, s_order = morton_sort(src, src_mask, src_block)
    ts, tv, t_order = morton_sort(tgt, tgt_mask, tgt_block)
    idx_s, d2_s = nn_search_pruned_presorted(
        ss, sv, ts, tv, gate, src_block=src_block, tgt_block=tgt_block,
        interpret=interpret)
    # undo both sorts: indices point into sorted targets; rows are in
    # sorted source order
    idx_orig = t_order[idx_s]
    inv = jnp.zeros_like(s_order).at[s_order].set(
        jnp.arange(s_order.shape[0]))
    return idx_orig[inv][:S], d2_s[inv][:S]
