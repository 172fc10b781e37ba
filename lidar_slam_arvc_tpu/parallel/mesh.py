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


def resolve_mesh(mesh_devices: int, axis: str = "data") -> Mesh | None:
    """IcpConfig.mesh_devices -> Mesh (None = run single-device).

    1 -> None (single device), 0 -> all visible devices (None if only one),
    N>1 -> exactly N devices (error if fewer are visible).
    """
    if mesh_devices == 1:
        return None
    avail = len(jax.devices())
    n = avail if mesh_devices == 0 else mesh_devices
    if n > avail:
        raise ValueError(f"mesh_devices={mesh_devices} but only {avail} "
                         "devices visible")
    return data_mesh(n, axis) if n > 1 else None


def shard_batch(mesh: Mesh, *arrays, axis: str = "data"):
    """Place arrays with their leading (batch) axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sharding) for a in arrays)
