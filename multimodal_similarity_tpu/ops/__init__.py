"""Core device-side math: pairwise distances, metric losses, online mining."""

from multimodal_similarity_tpu.ops.distances import (
    all_diffs,
    cdist,
    pairwise_distance,
    self_distance,
)
from multimodal_similarity_tpu.ops.losses import (
    batch_hard,
    classification_loss,
    cluster_loss,
    dcca_loss,
    lifted_loss,
    normalized_mutual_information,
    npairs_loss,
    triplet_loss,
    triplet_loss_masked,
    triplet_semihard_loss,
    weighted_triplet_loss,
)
from multimodal_similarity_tpu.ops.mining import (
    mine_semihard_triplets,
    select_triplets_facenet,
    select_triplets_random,
)

__all__ = [
    "all_diffs",
    "cdist",
    "pairwise_distance",
    "self_distance",
    "triplet_loss",
    "triplet_loss_masked",
    "weighted_triplet_loss",
    "batch_hard",
    "lifted_loss",
    "npairs_loss",
    "triplet_semihard_loss",
    "cluster_loss",
    "normalized_mutual_information",
    "dcca_loss",
    "classification_loss",
    "mine_semihard_triplets",
    "select_triplets_facenet",
    "select_triplets_random",
]
