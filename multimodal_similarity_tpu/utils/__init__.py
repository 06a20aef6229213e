"""Shared utilities: logging, timing, profiling."""

from multimodal_similarity_tpu.utils.logging import MetricsLogger
from multimodal_similarity_tpu.utils.profiling import (
    device_memory_stats,
    time_fn,
    trace,
)
from multimodal_similarity_tpu.utils.timing import StepTimer
from multimodal_similarity_tpu.utils.watchdog import StepWatchdog

__all__ = ["MetricsLogger", "StepTimer", "StepWatchdog", "trace",
           "time_fn", "device_memory_stats"]
