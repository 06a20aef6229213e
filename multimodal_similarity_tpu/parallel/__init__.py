"""Parallelism: device meshes, data-parallel steps, sharded-gallery eval.

The reference is strictly single-GPU (SURVEY.md §2.8) — these are new
first-class components: batch data-parallelism over ICI via sharding
annotations (XLA SPMD inserts the collectives), and model-parallel
retrieval where the gallery is sharded across chips.
"""

from multimodal_similarity_tpu.parallel.mesh import (
    auto_mesh,
    create_mesh,
    replicate,
    shard_batch,
)
from multimodal_similarity_tpu.parallel.data_parallel import (
    make_dp_triplet_step,
)
from multimodal_similarity_tpu.parallel.multihost import (
    host_local_sessions,
    make_global_batch,
)
from multimodal_similarity_tpu.parallel.pipeline import (
    PipelinedBackbone,
    split_units_balanced,
)
from multimodal_similarity_tpu.parallel.ring_lifted import (
    make_ring_lifted_loss,
    make_ring_lifted_stats_grad,
)
from multimodal_similarity_tpu.parallel.ring_mining import (
    make_ring_batch_hard_loss,
    make_ring_batch_hard_stats_grad,
    ring_batch_hard_stats,
)
from multimodal_similarity_tpu.parallel.sharded_eval import (
    sharded_retrieval_topk,
)
from multimodal_similarity_tpu.parallel.tensor_parallel import (
    auto_mesh_tp,
    create_2d_mesh,
    shard_params_tp,
    shard_state_tp,
    tp_sharded_leaves,
)

__all__ = [
    "auto_mesh",
    "create_mesh",
    "shard_batch",
    "replicate",
    "make_dp_triplet_step",
    "sharded_retrieval_topk",
    "ring_batch_hard_stats",
    "make_ring_batch_hard_stats_grad",
    "make_ring_batch_hard_loss",
    "make_ring_lifted_stats_grad",
    "make_ring_lifted_loss",
    "make_global_batch",
    "host_local_sessions",
    "shard_params_tp",
    "shard_state_tp",
    "tp_sharded_leaves",
    "auto_mesh_tp",
    "create_2d_mesh",
    "PipelinedBackbone",
    "split_units_balanced",
]
