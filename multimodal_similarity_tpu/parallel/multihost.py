"""Multi-host input feeding.

Each host's loader produces its local slice of the global batch; arrays
are assembled into globally-sharded jax.Arrays without any cross-host
copy of feature data (the DCN boundary carries only metadata) — the
replacement for the reference's single-process tf.py_func feeding at
multi-slice scale (SURVEY.md §5 'per-host sharded array feeding').

On a single process this reduces to a plain device_put, so the same
trainer code runs everywhere.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None) -> None:
    """jax.distributed bootstrap for multi-host runs (no-op when the
    environment provides the settings, e.g. on Cloud TPU pods).

    When coordinator settings are passed EXPLICITLY, failure raises: a
    misconfigured pod run must die loudly, not degrade into N silent
    single-process trainings.  Only the zero-argument environment-driven
    form is allowed to fall back (it is a best-effort probe on platforms
    that may not provide a distributed runtime at all).
    """
    # NOTE: probe via the distributed-runtime state, NOT
    # jax.process_count() — that call initializes the XLA backend, after
    # which jax.distributed.initialize refuses to run (a latent bug the
    # old swallow-all except used to hide)
    if jax.distributed.is_initialized():
        return
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return
    if num_processes is not None or process_id is not None:
        # partial explicit config: without the coordinator the env-driven
        # probe below would swallow the failure and every host would train
        # independently under the same experiment name
        raise ValueError(
            "--num_processes/--process_id were given without "
            "--coordinator_address; pass all three (or none, on a pod "
            "environment that provides them)")
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-process / no env-provided cluster config


def put_global(sharding, x):
    """ONE host-local array -> a (possibly multi-process) global jax.Array.

    The single primitive both feeding paths share (make_global_batch here,
    data/device_feed.make_batch_placer on the prefetch thread) so the
    multi-host assembly semantics cannot diverge between them.  With >1
    process, ``x`` is this host's rows for the sharded axes; for a fully
    REPLICATED sharding every host must pass the same values — per-host
    divergent data under a replicated spec is silently wrong.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)


def make_global_batch(mesh: Mesh, local_batch: Any,
                      axis: str = "data") -> Any:
    """Per-host local arrays -> globally sharded jax.Arrays.

    ``local_batch`` holds THIS host's rows of the global batch (global
    batch size = local rows * process_count).  Leading axis is sharded
    over ``axis``; everything else replicated.
    """

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim else P()
        return put_global(NamedSharding(mesh, spec), x)

    return jax.tree.map(put, local_batch)


def host_local_sessions(sessions, process_id=None, process_count=None):
    """Partition a session list across hosts (each host loads only its
    shard of the sessions)."""
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    return [s for i, s in enumerate(sessions) if i % pcount == pid]
