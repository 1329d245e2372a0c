"""Mesh construction and sharding helpers for data parallelism over ICI."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int | None = None) -> Mesh:
    """1-D ('data',) mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("data",))


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated on the mesh (no-op if already)."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(batch, mesh: Mesh, axis: int = 0):
    """Shard an array's ``axis`` across the 'data' mesh axis."""
    spec = [None] * batch.ndim
    spec[axis] = "data"
    return jax.device_put(batch, NamedSharding(mesh, P(*spec)))
