"""Factor definitions, noise table, and fixed-capacity factor buffers.

Noise sigmas reproduce reference graphslam/graphSLAM.py:13-53 exactly,
including the tangent ordering [rx, ry, rz, x, y, z] of GTSAM Pose3 (rpy
sigmas first).  Factors are stored struct-of-arrays with validity masks so
the solver is one static-shape program for a whole SLAM run.

Residual conventions (right perturbation X <- X Exp(delta), matching GTSAM's
Pose3 retraction):
  prior(i, Tp):     r = Log(Tp^-1 X_i)                 (6,)
  between(i,j,Tm):  r = Log(Tm^-1 X_i^-1 X_j)          (6,)
  gps(i, z):        r = t(X_i) - z                     (3,)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class NoiseSigmas(NamedTuple):
    """Diagonal factor sigmas (reference graphSLAM.py:13-53)."""
    prior: np.ndarray   # (6,) [rad x3, m x3]
    sm: np.ndarray      # (6,)
    odo: np.ndarray     # (6,)
    gps: np.ndarray     # (3,) [m x, y, altitude]


def _rpy_xyz(rpy_deg: float, xyz_m: float) -> np.ndarray:
    r = np.deg2rad(rpy_deg)
    return np.array([r, r, r, xyz_m, xyz_m, xyz_m], dtype=np.float64)


DEFAULT_SIGMAS = NoiseSigmas(
    prior=_rpy_xyz(10.0, 10.0),          # graphSLAM.py:13-15,32-37
    sm=_rpy_xyz(0.05, 0.05),             # graphSLAM.py:20-23,39-44
    odo=_rpy_xyz(3.0, 0.05),             # graphSLAM.py:16-19,46-51
    gps=np.array([2.5, 2.5, 3.0]),       # graphSLAM.py:24-26,53
)


class FactorData(NamedTuple):
    """Fixed-capacity factor buffers (device views of PoseGraph state)."""
    # between factors
    bt_i: jnp.ndarray        # (EB,) int32
    bt_j: jnp.ndarray        # (EB,) int32
    bt_T: jnp.ndarray        # (EB, 4, 4) measured T_i_j
    bt_winv: jnp.ndarray     # (EB, 6) 1/sigma whitening (0 rows = inactive)
    # gps unary factors
    gps_i: jnp.ndarray       # (EG,) int32
    gps_z: jnp.ndarray       # (EG, 3)
    gps_winv: jnp.ndarray    # (EG, 3)
    # priors
    pr_i: jnp.ndarray        # (EP,) int32
    pr_T: jnp.ndarray        # (EP, 4, 4)
    pr_winv: jnp.ndarray     # (EP, 6)


def make_factor_buffers(n_between: int, n_gps: int, n_prior: int) -> FactorData:
    eye = jnp.eye(4, dtype=jnp.float32)
    return FactorData(
        bt_i=jnp.zeros(n_between, dtype=jnp.int32),
        bt_j=jnp.zeros(n_between, dtype=jnp.int32),
        bt_T=jnp.tile(eye, (n_between, 1, 1)),
        bt_winv=jnp.zeros((n_between, 6), dtype=jnp.float32),
        gps_i=jnp.zeros(n_gps, dtype=jnp.int32),
        gps_z=jnp.zeros((n_gps, 3), dtype=jnp.float32),
        gps_winv=jnp.zeros((n_gps, 3), dtype=jnp.float32),
        pr_i=jnp.zeros(n_prior, dtype=jnp.int32),
        pr_T=jnp.tile(eye, (n_prior, 1, 1)),
        pr_winv=jnp.zeros((n_prior, 6), dtype=jnp.float32),
    )
