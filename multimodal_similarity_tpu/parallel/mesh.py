"""Device mesh + sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None,
                axis_names: Sequence[str] = ("data",),
                axis_sizes: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over the first ``n_devices`` devices.

    Multi-axis meshes take explicit ``axis_sizes`` (e.g. (4, 2) for a
    dp x tp layout); without them, the trailing axes are factored out of
    ``n_devices`` greedily (largest divisor <= sqrt of what remains), so
    e.g. 8 devices over 2 axes become 4 x 2 — never a k-th-root reshape
    that only works for perfect powers.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    devs = np.asarray(devices[:n_devices])
    if len(axis_names) > 1:
        if axis_sizes is not None:
            if int(np.prod(axis_sizes)) != n_devices:
                raise ValueError(
                    f"axis_sizes {tuple(axis_sizes)} != {n_devices} devices")
            shape = tuple(int(s) for s in axis_sizes)
        else:
            shape = []
            rem = n_devices
            for _ in range(len(axis_names) - 1):
                # largest divisor of rem that is <= sqrt(rem) becomes the
                # NEXT axis; the current axis takes the cofactor
                f = max(d for d in range(1, int(rem ** 0.5) + 1)
                        if rem % d == 0)
                shape.append(rem // f)
                rem = f
            shape.append(rem)
            shape = tuple(shape)
        devs = devs.reshape(shape)
    return Mesh(devs, axis_names)


def auto_mesh(batch_axis_size: int, min_devices: int = 2,
              verbose: bool = True):
    """(mesh | None, rounded_batch_axis_size) for transparent data
    parallelism: a 1-D "data" mesh over every visible device when more
    than one is present, with the batch-axis size rounded UP to a device
    multiple (batches are fixed-shape and mask-padded throughout, so
    rounding up is free).  Single-device -> (None, unchanged).
    ``verbose=False`` suppresses the rounding notice (silent_mode runs)."""
    n_devices = jax.device_count()
    if n_devices < min_devices:
        return None, batch_axis_size
    rounded = -(-batch_axis_size // n_devices) * n_devices
    if verbose and rounded != batch_axis_size:
        print(f"[parallel] batch axis {batch_axis_size} rounded up to "
              f"{rounded} for {n_devices}-device data parallelism")
    return create_mesh(n_devices), rounded


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
