"""Mesh construction and sharding helpers for data parallelism over ICI."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int | None = None,
              batch_size: int | None = None) -> Mesh:
    """1-D ('data',) mesh over the first n_devices (default: all).

    With ``batch_size`` and no explicit ``n_devices``, the mesh shrinks to
    the largest device count that divides the batch (a batch-2 debug run on
    an 8-device host trains on 2 devices instead of failing the P('data')
    sharding). An explicit ``n_devices`` that does not divide the batch is
    an error — silent shrinking would hide a misconfigured production run.
    """
    devs = jax.devices()
    if n_devices is not None:
        if batch_size is not None and batch_size % n_devices:
            raise ValueError(
                f"--batch_size {batch_size} is not divisible by "
                f"--n_devices {n_devices}"
            )
        devs = devs[:n_devices]
    elif batch_size is not None:
        n = max(d for d in range(1, len(devs) + 1) if batch_size % d == 0)
        devs = devs[:n]
    return Mesh(np.asarray(devs), ("data",))


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated on the mesh (no-op if already)."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(batch, mesh: Mesh, axis: int = 0):
    """Shard an array's ``axis`` across the 'data' mesh axis."""
    spec = [None] * batch.ndim
    spec[axis] = "data"
    return jax.device_put(batch, NamedSharding(mesh, P(*spec)))
