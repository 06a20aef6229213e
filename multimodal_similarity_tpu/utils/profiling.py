"""Profiling: jax.profiler traces + step timing.

The reference's observability was wall-clock prints per batch
(base_model.py:290-291); here traces capture the real device timeline
(SURVEY.md §5 'TPU equivalent: jax.profiler trace + per-step host timing').
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _hard_sync(out):
    """Synchronize on `out` with a host readback of one element per leaf.

    jax.block_until_ready is not a reliable barrier on some remote PJRT
    backends (observed returning before execution finished, turning timers
    into dispatch-rate measurements); reading a value back to the host is
    unambiguous.  Only one scalar per array leaf crosses the wire.
    """
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            float(leaf.ravel()[0])


def time_fn(fn, *args, reps: int = 10, warmup: int = 1, **kwargs) -> float:
    """Mean seconds per call, synchronized via host readback (see
    _hard_sync for why not block_until_ready)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    _hard_sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kwargs)
    _hard_sync(out)
    return (time.time() - t0) / reps


def device_memory_stats() -> Optional[dict]:
    """Per-device memory stats when the backend exposes them."""
    try:
        dev = jax.devices()[0]
        return dev.memory_stats()
    except Exception:
        return None
