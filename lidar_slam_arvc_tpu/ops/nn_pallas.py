"""Pallas TPU kernel for the nearest-neighbor sweep.

Fuses the distance matmul, the running row-min and the argmin bookkeeping of
ops.nn.nn_search into one kernel: the (BS, BT) score tile lives only in
VMEM/registers, the (S, T) distance matrix never touches HBM, and the
per-source best (value, index) carries across target tiles in VMEM scratch.

Two VPU savings over the XLA formulation:
  * the ||s||^2 term is dropped inside the sweep — it is constant per source
    row and cannot change the argmin — and added back once at the end;
  * min and argmin are computed from one fused select pass per tile.

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


def _nn_kernel(src_ref, tgt_ref, t2_ref, out_d2_ref, out_idx_ref,
               best_val, best_idx):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_val[:] = jnp.full_like(best_val, jnp.inf)
        best_idx[:] = jnp.zeros_like(best_idx)

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

    tile_min = jnp.min(score, axis=1, keepdims=True)            # (BS, 1)
    tile_arg = jnp.argmin(score, axis=1).astype(jnp.int32)[:, None]
    bt = score.shape[1]
    tile_arg = tile_arg + j * bt

    better = tile_min < best_val[:]
    best_val[:] = jnp.where(better, tile_min, best_val[:])
    best_idx[:] = jnp.where(better, tile_arg, best_idx[:])

    @pl.when(j == n_j - 1)
    def _():
        s2 = jnp.sum(src * src, axis=1, keepdims=True)
        out_d2_ref[:] = jnp.maximum(best_val[:] + s2, 0.0)
        out_idx_ref[:] = best_idx[:]


@functools.partial(jax.jit,
                   static_argnames=("src_block", "tgt_block", "interpret"))
def nn_search_pallas(src: jax.Array, tgt: jax.Array, tgt_mask: jax.Array,
                     src_block: int = 512, tgt_block: int = 2048,
                     interpret: bool = False):
    """Drop-in Pallas variant of ops.nn.nn_search (3-D points only)."""
    S = src.shape[0]
    T = tgt.shape[0]
    pad_s = (-S) % src_block
    pad_t = (-T) % tgt_block
    src_p = jnp.pad(src, ((0, pad_s), (0, 0)))
    tgt_p = jnp.pad(tgt, ((0, pad_t), (0, 0)))
    mask_p = jnp.pad(tgt_mask, (0, pad_t))
    t2 = (jnp.sum(tgt_p * tgt_p, axis=-1)
          + jnp.where(mask_p, 0.0, _BIG))[None, :]  # (1, Tp)

    Sp = src_p.shape[0]
    Tp = tgt_p.shape[0]
    grid = (Sp // src_block, Tp // tgt_block)

    d2, idx = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((src_block, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((tgt_block, 3), lambda i, j: (j, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, tgt_block), lambda i, j: (0, j),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((src_block, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((src_block, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
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
    )(src_p, tgt_p, t2)

    return idx[:S, 0], d2[:S, 0]
