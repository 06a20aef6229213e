"""Wall-clock step timing, mirroring the reference's per-batch
load/select/train timers (base_model.py:244-291), synchronized via host
readback so device work is actually measured (see profiling._hard_sync:
block_until_ready is not a reliable barrier on some remote backends)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict


class StepTimer:
    """Accumulates named phase durations; pass ``block_on`` to sync on a
    device value before stopping the clock."""

    def __init__(self):
        self.durations: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        start = time.time()
        try:
            yield
        finally:
            if block_on is not None:
                from multimodal_similarity_tpu.utils.profiling import (
                    _hard_sync)
                _hard_sync(block_on)
            self.durations[name] = self.durations.get(name, 0.0) + \
                (time.time() - start)

    def reset(self) -> Dict[str, float]:
        out = dict(self.durations)
        self.durations.clear()
        return out
