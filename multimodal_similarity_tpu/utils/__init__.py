"""Shared utilities: logging, timing, profiling."""

from multimodal_similarity_tpu.utils.logging import MetricsLogger
from multimodal_similarity_tpu.utils.timing import StepTimer

__all__ = ["MetricsLogger", "StepTimer"]
