"""Pallas TPU kernel for the nearest-neighbor sweep.

Fuses the distance computation, the running row-min and the argmin
bookkeeping of ops.nn.nn_search into one kernel: the (BS, BT) score tile
lives only in VMEM/registers, the (S, T) distance matrix never touches HBM,
and the per-source best (value, index) carries across target tiles in VMEM
scratch.

Distance formulations provided (benchmarks/nn_roofline.py measures all):

  * ``impl='vpu'`` (default): per-coordinate broadcast subtract/square,
    score = dx^2+dy^2+dz^2 entirely on the VPU in exact f32. The matmul
    identity is a bad fit for the MXU here — the contraction depth is 3
    (padded to 128 on the systolic array, ~42x wasted work) and geometry
    needs Precision.HIGHEST (6 bf16 passes); the VPU formulation avoids
    both, and is also better conditioned (no ||t||^2 - 2 s.t cancellation).
  * ``impl='vpu2'``: like 'vpu' but the validity penalty is baked into the
    target coordinates (masked points moved to the far sentinel _SENT),
    dropping the penalty stream and its per-element add.  Masked winners
    report d2 >= ~4e14 instead of ~1e12 — far beyond any correspondence
    gate for any terrestrial coordinate frame.
  * ``impl='vpu_t'``: transposed score tile (BT, BS) — sources on lanes,
    targets on sublanes; min/argmin reduce across sublanes instead of
    lanes.  Sentinel masking as in 'vpu2'.
  * ``impl='mxu'``: the original fused matmul-identity sweep, kept for
    benchmarking.

Grid: (S/BS, T/BT), target-minor; the output block for a source tile is
revisited across target tiles ("arbitrary" minor dimension), with scratch
carrying the running best.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e12
# sentinel coordinate for masked targets in the baked-penalty formulations:
# -4e7 m is beyond any terrestrial coordinate frame (UTM northings reach
# ~1e7), so d2 >= ~4e14 for every source with |coord| < 2e7 — no masked
# target can win the argmin or pass a correspondence gate, matching the
# additive-penalty semantics of 'vpu'/'mxu' without their extra stream.
_SENT = -4e7


def _finish(j, src_ref, out_d2_ref, out_idx_ref, best_val, best_idx,
            add_s2: bool):
    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        if add_s2:
            src = src_ref[:]
            s2 = jnp.sum(src * src, axis=1, keepdims=True)
            out_d2_ref[:] = jnp.maximum(best_val[:] + s2, 0.0)
        else:
            out_d2_ref[:] = best_val[:]
        out_idx_ref[:] = best_idx[:]


def _update_best(score, j, best_val, best_idx):
    @pl.when(j == 0)
    def _():
        best_val[:] = jnp.full_like(best_val, jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

    tile_min = jnp.min(score, axis=1, keepdims=True)            # (BS, 1)
    tile_arg = jnp.argmin(score, axis=1).astype(jnp.int32)[:, None]
    tile_arg = tile_arg + j * score.shape[1]

    better = tile_min < best_val[:]
    best_val[:] = jnp.where(better, tile_min, best_val[:])
    best_idx[:] = jnp.where(better, tile_arg, best_idx[:])


def _nn_kernel_vpu(src_ref, tgtT_ref, pen_ref, out_d2_ref, out_idx_ref,
                   best_val, best_idx):
    j = pl.program_id(1)
    src = src_ref[:]                                 # (BS, 3)
    # (BS,1) - (1,BT) lane-broadcasts: pure VPU, exact f32
    dx = src[:, 0:1] - tgtT_ref[0:1, :]
    dy = src[:, 1:2] - tgtT_ref[1:2, :]
    dz = src[:, 2:3] - tgtT_ref[2:3, :]
    score = dx * dx + dy * dy + dz * dz + pen_ref[:]  # (BS, BT)
    _update_best(score, j, best_val, best_idx)
    _finish(j, src_ref, out_d2_ref, out_idx_ref, best_val, best_idx,
            add_s2=False)


def _nn_kernel_vpu2(src_ref, tgtT_ref, out_d2_ref, out_idx_ref,
                    best_val, best_idx):
    """'vpu' minus the penalty stream: masked targets sit at _SENT."""
    j = pl.program_id(1)
    src = src_ref[:]                                 # (BS, 3)
    dx = src[:, 0:1] - tgtT_ref[0:1, :]
    dy = src[:, 1:2] - tgtT_ref[1:2, :]
    dz = src[:, 2:3] - tgtT_ref[2:3, :]
    score = dx * dx + dy * dy + dz * dz              # (BS, BT)
    _update_best(score, j, best_val, best_idx)
    _finish(j, src_ref, out_d2_ref, out_idx_ref, best_val, best_idx,
            add_s2=False)


def _nn_kernel_vpu_t(srcT_ref, tgt_ref, out_d2_ref, out_idx_ref,
                     best_val, best_idx):
    """Transposed tile: score is (BT, BS); reductions run over sublanes."""
    j = pl.program_id(1)
    dx = tgt_ref[:, 0:1] - srcT_ref[0:1, :]          # (BT, BS)
    dy = tgt_ref[:, 1:2] - srcT_ref[1:2, :]
    dz = tgt_ref[:, 2:3] - srcT_ref[2:3, :]
    score = dx * dx + dy * dy + dz * dz

    @pl.when(j == 0)
    def _():
        best_val[:] = jnp.full_like(best_val, jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

    tile_min = jnp.min(score, axis=0, keepdims=True)             # (1, BS)
    tile_arg = jnp.argmin(score, axis=0).astype(jnp.int32)[None, :]
    tile_arg = tile_arg + j * score.shape[0]

    better = tile_min < best_val[:]
    best_val[:] = jnp.where(better, tile_min, best_val[:])
    best_idx[:] = jnp.where(better, tile_arg, best_idx[:])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_d2_ref[:] = best_val[:]
        out_idx_ref[:] = best_idx[:]


def _nn_kernel_vpu_tq(srcT_ref, tgt_ref, qnT_ref, out_d2_ref, out_qn_ref,
                      best_val, best_qn):
    """'vpu_t' returning winner VALUES (target point + normal) not indices.

    ICP consumes the winner's coordinates and normal, not its index
    (registration/icp.py step()); returning values directly fuses the two
    downstream row-gathers into the sweep.  Selection rides the otherwise
    idle MXU: an exact one-hot (BT, BS) f32 matmul against the (8, BT)
    value table — one-hot products are exact at any precision, and the
    contraction has a single nonzero term per output, so the result is the
    winner row bit-exactly.  Layouts stay transposed throughout: scratch
    best_qn is (8, BS) so the (1, BS) `better` row broadcasts across
    sublanes with no relayout.
    """
    j = pl.program_id(1)
    dx = tgt_ref[:, 0:1] - srcT_ref[0:1, :]          # (BT, BS)
    dy = tgt_ref[:, 1:2] - srcT_ref[1:2, :]
    dz = tgt_ref[:, 2:3] - srcT_ref[2:3, :]
    score = dx * dx + dy * dy + dz * dz

    @pl.when(j == 0)
    def _():
        best_val[:] = jnp.full_like(best_val, jnp.inf)
        best_qn[:] = jnp.zeros_like(best_qn)

    tile_min = jnp.min(score, axis=0, keepdims=True)             # (1, BS)
    tile_arg = jnp.argmin(score, axis=0).astype(jnp.int32)[None, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)   # (BT, BS)
    onehot = (rows == tile_arg).astype(jnp.float32)              # (BT, BS)
    # (8, BT) @ (BT, BS) -> (8, BS): the tile winner's [q, n] per source
    sel = jax.lax.dot_general(
        qnT_ref[:], onehot, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    better = tile_min < best_val[:]                              # (1, BS)
    best_val[:] = jnp.where(better, tile_min, best_val[:])
    best_qn[:] = jnp.where(better, sel, best_qn[:])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_d2_ref[:] = best_val[:]
        out_qn_ref[:] = best_qn[:]


@functools.partial(jax.jit,
                   static_argnames=("src_block", "tgt_block", "interpret"))
def nn_search_pallas_vals(src: jax.Array, tgt: jax.Array, tgt_mask: jax.Array,
                          tgt_normals: jax.Array,
                          src_block: int = 2048, tgt_block: int = 1024,
                          interpret: bool = False):
    """Gather-free NN sweep: returns (d2, q, n) winner values per source.

    Same exact semantics as ``nn_search_pallas(impl='vpu_t')`` followed by
    ``tgt[idx]`` / ``tgt_normals[idx]``, with the gathers fused into the
    kernel (see _nn_kernel_vpu_tq).  Masked targets sit at the far sentinel
    so their d2 exceeds any correspondence gate; their (real) coordinates
    can only surface with such a d2, which downstream weighting zeroes.
    """
    S = src.shape[0]
    T = tgt.shape[0]
    pad_s = (-S) % src_block
    pad_t = (-T) % tgt_block
    src_p = jnp.pad(src, ((0, pad_s), (0, 0)))
    tgt_p = jnp.pad(tgt, ((0, pad_t), (0, 0)))
    mask_p = jnp.pad(tgt_mask, (0, pad_t))
    nrm_p = jnp.pad(tgt_normals, ((0, pad_t), (0, 0)))

    Sp = src_p.shape[0]
    Tp = tgt_p.shape[0]
    grid = (Sp // src_block, Tp // tgt_block)
    mem = pl.ANY if interpret else pltpu.VMEM

    srcT = jnp.pad(src_p.T, ((0, 5), (0, 0)))                    # (8, Sp)
    tgt_sent = jnp.where(mask_p[:, None], tgt_p, _SENT)          # (Tp, 3)
    qnT = jnp.concatenate(
        [tgt_p.T, nrm_p.T, jnp.zeros((2, Tp), jnp.float32)], axis=0)  # (8, Tp)

    d2, qn = pl.pallas_call(
        _nn_kernel_vpu_tq,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, src_block), lambda i, j: (0, i),
                         memory_space=mem),
            pl.BlockSpec((tgt_block, 3), lambda i, j: (j, 0),
                         memory_space=mem),
            pl.BlockSpec((8, tgt_block), lambda i, j: (0, j),
                         memory_space=mem),
        ],
        out_specs=[
            pl.BlockSpec((1, src_block), lambda i, j: (0, i),
                         memory_space=mem),
            pl.BlockSpec((8, src_block), lambda i, j: (0, i),
                         memory_space=mem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Sp), jnp.float32),
            jax.ShapeDtypeStruct((8, Sp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, src_block), jnp.float32),
            pltpu.VMEM((8, src_block), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ) if not interpret else None,
        interpret=interpret,
    )(srcT, tgt_sent, qnT)
    return d2[0, :S], qn[:3, :S].T, qn[3:6, :S].T


def _nn_kernel_mxu(src_ref, tgt_ref, t2_ref, out_d2_ref, out_idx_ref,
                   best_val, best_idx):
    j = pl.program_id(1)
    src = src_ref[:]                        # (BS, 3)
    tgt = tgt_ref[:]                        # (BT, 3)
    # score = ||t||^2 - 2 s.t  (||s||^2 added after the sweep).
    # Precision.HIGHEST is essential: the MXU default rounds inputs to
    # bfloat16, which at ~30 m coordinates perturbs scores by units and
    # corrupts the argmin.
    cross = jax.lax.dot_general(
        src, tgt, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # (BS, BT)
    score = t2_ref[:] - 2.0 * cross          # t2 broadcast (1, BT)
    _update_best(score, j, best_val, best_idx)
    _finish(j, src_ref, out_d2_ref, out_idx_ref, best_val, best_idx,
            add_s2=True)


@functools.partial(jax.jit,
                   static_argnames=("src_block", "tgt_block", "interpret",
                                    "impl"))
def nn_search_pallas(src: jax.Array, tgt: jax.Array, tgt_mask: jax.Array,
                     src_block: int = 512, tgt_block: int = 2048,
                     interpret: bool = False, impl: str = "vpu"):
    """Drop-in Pallas variant of ops.nn.nn_search (3-D points only)."""
    S = src.shape[0]
    T = tgt.shape[0]
    pad_s = (-S) % src_block
    pad_t = (-T) % tgt_block
    src_p = jnp.pad(src, ((0, pad_s), (0, 0)))
    tgt_p = jnp.pad(tgt, ((0, pad_t), (0, 0)))
    mask_p = jnp.pad(tgt_mask, (0, pad_t))

    Sp = src_p.shape[0]
    Tp = tgt_p.shape[0]
    grid = (Sp // src_block, Tp // tgt_block)
    mem = pl.ANY if interpret else pltpu.VMEM

    if impl == "vpu_t":
        # transposed tile: (3+pad, Sp) sources on lanes, (Tp, 3) targets on
        # sublanes; outputs/scratch are (1, BS) rows
        srcT = jnp.pad(src_p.T, ((0, 5), (0, 0)))               # (8, Sp)
        tgt_sent = jnp.where(mask_p[:, None], tgt_p, _SENT)
        d2, idx = pl.pallas_call(
            _nn_kernel_vpu_t,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, src_block), lambda i, j: (0, i),
                             memory_space=mem),
                pl.BlockSpec((tgt_block, 3), lambda i, j: (j, 0),
                             memory_space=mem),
            ],
            out_specs=[
                pl.BlockSpec((1, src_block), lambda i, j: (0, i),
                             memory_space=mem),
                pl.BlockSpec((1, src_block), lambda i, j: (0, i),
                             memory_space=mem),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, Sp), jnp.float32),
                jax.ShapeDtypeStruct((1, Sp), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((1, src_block), jnp.float32),
                pltpu.VMEM((1, src_block), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ) if not interpret else None,
            interpret=interpret,
        )(srcT, tgt_sent)
        return idx[0, :S], d2[0, :S]

    if impl == "vpu":
        kernel = _nn_kernel_vpu
        aux_in = (tgt_p.T,                                      # (3, Tp)
                  jnp.where(mask_p, 0.0, _BIG)[None, :])        # (1, Tp)
        aux_specs = [
            pl.BlockSpec((3, tgt_block), lambda i, j: (0, j), memory_space=mem),
            pl.BlockSpec((1, tgt_block), lambda i, j: (0, j), memory_space=mem),
        ]
    elif impl == "vpu2":
        kernel = _nn_kernel_vpu2
        tgtT_sent = jnp.where(mask_p, tgt_p.T, _SENT)           # (3, Tp)
        aux_in = (tgtT_sent,)
        aux_specs = [
            pl.BlockSpec((3, tgt_block), lambda i, j: (0, j), memory_space=mem),
        ]
    elif impl == "mxu":
        kernel = _nn_kernel_mxu
        t2 = (jnp.sum(tgt_p * tgt_p, axis=-1)
              + jnp.where(mask_p, 0.0, _BIG))[None, :]          # (1, Tp)
        aux_in = (tgt_p, t2)
        aux_specs = [
            pl.BlockSpec((tgt_block, 3), lambda i, j: (j, 0), memory_space=mem),
            pl.BlockSpec((1, tgt_block), lambda i, j: (0, j), memory_space=mem),
        ]
    else:
        raise ValueError(f"unknown impl {impl!r} (vpu|vpu2|vpu_t|mxu)")

    d2, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((src_block, 3), lambda i, j: (i, 0),
                         memory_space=mem),
            *aux_specs,
        ],
        out_specs=[
            pl.BlockSpec((src_block, 1), lambda i, j: (i, 0),
                         memory_space=mem),
            pl.BlockSpec((src_block, 1), lambda i, j: (i, 0),
                         memory_space=mem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Sp, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((src_block, 1), jnp.float32),
            pltpu.VMEM((src_block, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ) if not interpret else None,
        interpret=interpret,
    )(src_p, *aux_in)

    return idx[:S, 0], d2[:S, 0]
