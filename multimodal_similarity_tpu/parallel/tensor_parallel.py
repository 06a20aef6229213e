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


def _put(leaf, sharding: NamedSharding):
    """Place one leaf.  Multi-process meshes cannot be device_put from
    one host; each process contributes via
    ``make_array_from_process_local_data`` instead.  Every sharding this
    module produces is either replicated or model-column sharded —
    never split over a cross-host axis — so each process's addressable
    shards are covered by the FULL host-local value (identical on every
    host, same seed), which is exactly what the call expects."""
    if len({d.process_index for d in sharding.mesh.devices.flat}) == 1:
        return jax.device_put(leaf, sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(leaf), np.shape(leaf))


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """Place a param pytree with trailing-dim (column) sharding over
    ``axis``.  Pure placement: values are unchanged."""

    def put(path, leaf):
        spec = tp_spec_for(path, leaf, mesh, axis)
        return _put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def create_2d_mesh(n_devices: int, model_parallel: int = 2,
                   axis_names=("data", "model")) -> Mesh:
    """(n_devices/model_parallel) x model_parallel mesh."""
    devices = np.asarray(jax.devices()[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel)
    return Mesh(devices, axis_names)


def shard_state_tp(state, mesh: Mesh, axis: str = "model"):
    """Place an entire TrainState with column (trailing-dim) sharding over
    ``axis``: parameters AND their optimizer moments (same shapes -> same
    specs), scalars replicated.  The jitted steps take the state with
    in_shardings=None, so XLA SPMD propagates these placements through the
    whole step — each wide matmul runs column-parallel and the optimizer
    update stays shard-local (zero collectives on the update itself)."""

    def put(path, leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return _put(leaf, NamedSharding(mesh, P()))
        return _put(leaf,
                    NamedSharding(mesh, tp_spec_for(path, leaf, mesh, axis)))

    return jax.tree_util.tree_map_with_path(put, state)


def tp_sharded_leaves(params, mesh: Mesh, axis: str = "model"):
    """[(path, spec)] of the leaves :func:`shard_params_tp` would split —
    the trainer-surface assertion that --model_parallel actually sharded
    the wide kernels (an all-replicated "tp" run is a silent no-op)."""
    out = []

    def visit(path, leaf):
        spec = tp_spec_for(path, leaf, mesh, axis)
        if any(s == axis for s in spec):
            out.append((jax.tree_util.keystr(path), spec))
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return out


def auto_mesh_tp(batch_axis_size: int, model_parallel: int,
                 verbose: bool = True):
    """(mesh, rounded_batch_axis_size) for --model_parallel N: a 2-D
    (devices/N) x N dp x tp mesh over every visible device, with the
    batch axis rounded up to a data-axis multiple.  N must divide the
    device count; N == device_count is pure tensor parallelism (data
    axis of size 1)."""
    n_devices = jax.device_count()
    if model_parallel > n_devices or n_devices % model_parallel:
        raise ValueError(
            f"--model_parallel {model_parallel} does not divide the "
            f"{n_devices} visible devices")
    if jax.process_count() > 1 and \
            jax.local_device_count() % model_parallel:
        # keep every model-column group (and therefore every data row)
        # within one host: tp collectives ride ICI, the data axis aligns
        # to processes (the per-host feed and the device cache both
        # require whole data shards per host)
        raise ValueError(
            f"--model_parallel {model_parallel} does not divide the "
            f"{jax.local_device_count()} devices per host; a tp group "
            "must not span hosts")
    data = n_devices // model_parallel
    rounded = -(-batch_axis_size // data) * data
    if verbose:
        print(f"[parallel] dp x tp mesh {data} x {model_parallel}"
              + (f"; batch axis {batch_axis_size} -> {rounded}"
                 if rounded != batch_axis_size else ""))
    return create_2d_mesh(n_devices, model_parallel), rounded
