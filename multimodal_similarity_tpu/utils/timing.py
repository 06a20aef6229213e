"""Wall-clock step timing, mirroring the reference's per-batch
load/select/train timers (base_model.py:244-291) with block_until_ready
framing so device work is actually measured."""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class StepTimer:
    """Accumulates named phase durations; ``block=True`` syncs the device."""

    def __init__(self):
        self.durations: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        start = time.time()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.durations[name] = self.durations.get(name, 0.0) + \
                (time.time() - start)

    def reset(self) -> Dict[str, float]:
        out = dict(self.durations)
        self.durations.clear()
        return out
