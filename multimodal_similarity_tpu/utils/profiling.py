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


class StepWindowProfiler:
    """Trace a window of steady-state train steps (``--profile_dir``).

    ``update(step)`` starts the jax.profiler trace when ``step`` reaches
    ``start_step`` (default 1: AFTER the compile step, so the trace shows
    the real per-step timeline, not one giant XlaCompile block) and stops
    it ``num_steps`` steps later.  Call ``close()`` on trainer exit so an
    interrupted window still flushes a viewable trace.  No-op when
    ``log_dir`` is empty.
    """

    def __init__(self, log_dir: str, num_steps: int = 5,
                 start_step: int = 1):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._base = None  # first observed step: windows are RELATIVE so
        self._active = False  # checkpoint-resumed runs still trace num_steps
        self._done = not log_dir

    def update(self, step: int) -> None:
        if self._done:
            return
        if self._base is None:
            # the first observed step is the compile step regardless of the
            # restored optimizer step count
            self._base = step - 1
        step = step - self._base
        if not self._active and step >= self.start_step:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
        self._done = True


def device_memory_stats() -> Optional[dict]:
    """Per-device memory stats when the backend exposes them."""
    try:
        dev = jax.devices()[0]
        return dev.memory_stats()
    except Exception:
        return None
