"""Pallas TPU kernels for the O(N^2) hot paths.

- fused pairwise-distance + batch-hard reduction (never materializes the
  N x N matrix in HBM), with a custom VJP that back-propagates through the
  argmax/argmin winners only;
- tiled pairwise squared-distance building block.

All kernels fall back to interpret mode off-TPU so the test suite runs on
CPU.
"""

from multimodal_similarity_tpu.ops.pallas.batch_hard import (
    batch_hard_pallas,
    fused_batch_hard_stats,
)
from multimodal_similarity_tpu.ops.pallas.distance import pallas_sqdist
from multimodal_similarity_tpu.ops.pallas.lifted import (
    fused_lifted_stats,
    lifted_loss_pallas,
)

__all__ = [
    "pallas_sqdist",
    "fused_batch_hard_stats",
    "batch_hard_pallas",
    "fused_lifted_stats",
    "lifted_loss_pallas",
]
