"""Tensor-parallel parameter sharding.

These encoders are small enough that data parallelism usually suffices,
but wide configurations (emb_dim >= 1024, 1536-channel conv embeddings)
can shard their weight matrices over a ``model`` mesh axis: kernels split
on the output dimension, biases on their only dimension, everything else
replicated.  XLA's SPMD partitioner then runs each matmul
column-parallel and inserts the ICI collectives where activations need to
rejoin (e.g. the with_sharding_constraint(P()) before global mining).

Usage:
    mesh = create_mesh(8, ("data", "model"))
    params = shard_params_tp(params, mesh)       # placement only
    state = TrainState.create(params, tx)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_spec_for(path, leaf, mesh: Mesh, axis: str = "model"):
    """PartitionSpec for one param leaf: shard the trailing dim over
    ``axis`` when it divides evenly, else replicate."""
    size = mesh.shape[axis]
    if leaf.ndim >= 1 and leaf.shape[-1] % size == 0 and \
            leaf.shape[-1] >= 2 * size:
        return P(*([None] * (leaf.ndim - 1) + [axis]))
    return P()


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """Place a param pytree with trailing-dim (column) sharding over
    ``axis``.  Pure placement: values are unchanged."""

    def put(path, leaf):
        spec = tp_spec_for(path, leaf, mesh, axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def create_2d_mesh(n_devices: int, model_parallel: int = 2,
                   axis_names=("data", "model")) -> Mesh:
    """(n_devices/model_parallel) x model_parallel mesh."""
    devices = np.asarray(jax.devices()[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel)
    return Mesh(devices, axis_names)
