"""Step watchdog: hang detection for long-running loops.

The reference had no failure detection (SURVEY.md §5); recovery was manual
restart-from-checkpoint.  This watchdog covers the detection half: a
background timer that fires a callback (default: dump Python tracebacks to
stderr) when a step exceeds its deadline — useful for catching wedged
device calls or stuck host loaders in unattended runs.  Recovery remains
checkpoint-based (train/checkpoints.py restores are step-accurate).
"""

from __future__ import annotations

import faulthandler
import sys
import threading
from typing import Callable, Optional


class StepWatchdog:
    """Arm per step; bark if the step doesn't complete within ``timeout``.

    Usage:
        wd = StepWatchdog(timeout=300)
        for batch in loader:
            with wd.step():
                train_step(...)
    """

    def __init__(self, timeout: float,
                 on_timeout: Optional[Callable[[], None]] = None,
                 repeat: bool = False):
        self.timeout = timeout
        self.on_timeout = on_timeout or self._default_handler
        self.repeat = repeat
        self._timer: Optional[threading.Timer] = None
        self.fired = 0

    def _default_handler(self) -> None:
        sys.stderr.write(
            f"[watchdog] step exceeded {self.timeout}s — thread dump:\n")
        faulthandler.dump_traceback(file=sys.stderr)

    def _fire(self) -> None:
        self.fired += 1
        self.on_timeout()
        if self.repeat:
            self._arm()

    def _arm(self) -> None:
        self._timer = threading.Timer(self.timeout, self._fire)
        self._timer.daemon = True
        self._timer.start()

    def step(self):
        return _StepScope(self)


class _StepScope:
    def __init__(self, wd: StepWatchdog):
        self.wd = wd

    def __enter__(self):
        self.wd._arm()
        return self.wd

    def __exit__(self, *exc):
        if self.wd._timer is not None:
            self.wd._timer.cancel()
            self.wd._timer = None
        return False
