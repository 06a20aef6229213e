"""Retrieval evaluation: exact NumPy oracle + fast on-device metrics."""

from multimodal_similarity_tpu.eval.metrics import (
    average_precision,
    evaluate,
    evaluate_simple,
    precision_at_recall,
    recall_at_K,
    retrieval_metrics_device,
    retrieve_one,
)

__all__ = [
    "average_precision",
    "evaluate",
    "evaluate_simple",
    "precision_at_recall",
    "recall_at_K",
    "retrieve_one",
    "retrieval_metrics_device",
]
