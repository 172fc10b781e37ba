"""Device-mesh construction and batch sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first n available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis,))


def shard_batch(mesh: Mesh, *arrays, axis: str = "data"):
    """Place arrays with their leading (batch) axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sharding) for a in arrays)
