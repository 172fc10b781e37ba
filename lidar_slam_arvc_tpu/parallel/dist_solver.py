"""Distributed pose-graph normal equations: sharded assembly + psum.

The expensive part of a graph solve is evaluating/accumulating the factor
blocks (O(E) 6x6 matmuls); the dense 6Nx6N solve is comparatively small.
So: shard the between-factor arrays over the mesh's ``data`` axis, assemble
each shard's partial (H, b) locally inside ``shard_map``, ``psum`` the
partials over ICI, and run the damped solve replicated on every device
(identical inputs -> identical results, no broadcast needed).

This is the SURVEY.md §2.3 "distributed pose-graph solve" component; the
same structure extends to multi-host (jax.distributed) unchanged because
shard_map + psum compile to XLA collectives on ICI/DCN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lidar_slam_arvc_tpu import geom
from lidar_slam_arvc_tpu.graph.factors import FactorData
from lidar_slam_arvc_tpu.graph.solver import (
    _assemble_between, _assemble_unary, graph_cost,
)


def distributed_assemble(mesh: Mesh, poses: jax.Array, factors: FactorData,
                         n_active, axis: str = "data"):
    """(H, b) with between-edge blocks assembled shard-wise and psummed.

    The between-factor capacity must be divisible by the mesh size (pad with
    zero-weight rows — weight 0 rows contribute nothing).
    """
    def local_assemble(poses_rep, bt_i, bt_j, bt_T, bt_winv):
        H, b = _assemble_between(poses_rep, bt_i, bt_j, bt_T, bt_winv)
        return (jax.lax.psum(H, axis_name=axis),
                jax.lax.psum(b, axis_name=axis))

    sharded = P(axis)
    rep = P()
    H_bt, b_bt = jax.shard_map(
        local_assemble, mesh=mesh,
        in_specs=(rep, sharded, sharded, sharded, sharded),
        out_specs=(rep, rep),
    )(poses, factors.bt_i, factors.bt_j, factors.bt_T, factors.bt_winv)

    H_u, b_u = _assemble_unary(poses, factors, jnp.asarray(n_active))
    return H_bt + H_u, b_bt + b_u


def distributed_lm_step(mesh: Mesh, poses: jax.Array, factors: FactorData,
                        n_active, lam: float = 1e-6, axis: str = "data"):
    """One damped GN step with distributed assembly; returns (poses, cost)."""
    H, b = distributed_assemble(mesh, poses, factors, n_active, axis)
    di = jnp.arange(H.shape[0])
    damped = H.at[di, di].add(lam * jnp.diagonal(H) + 1e-9,
                              unique_indices=True)
    # same Jacobi equilibration as graph/solver._lm_step: cond(H) ~ 1e8 on
    # SLAM sigma tables, and the two solvers must follow the SAME LM
    # trajectory to stay comparable step-for-step
    s = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(damped), 1e-30))
    damped = damped * s[:, None] * s[None, :]
    delta = s * jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(damped, lower=True), -(b * s))
    delta = delta.reshape(-1, 6)
    active = (jnp.arange(poses.shape[0]) < n_active)[:, None]
    delta = jnp.where(active, delta, 0.0)
    new_poses = geom.compose(poses, geom.se3_exp(delta))
    return new_poses, graph_cost(new_poses, factors)
