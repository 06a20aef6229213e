"""Device mesh + sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None,
                axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D (or reshaped N-D) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    devs = np.asarray(devices[:n_devices])
    if len(axis_names) > 1:
        per = int(round(n_devices ** (1 / len(axis_names))))
        devs = devs.reshape((per,) * len(axis_names))
    return Mesh(devs, axis_names)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of arrays with the leading axis sharded over ``axis``."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
