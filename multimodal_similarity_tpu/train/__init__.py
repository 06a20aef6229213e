"""Training core: state, optimizers, checkpoints, loops, trainers."""

from multimodal_similarity_tpu.train.state import (
    TrainState,
    build_optimizer,
    l2_regularization,
    learning_rate_schedule,
)
from multimodal_similarity_tpu.train.checkpoints import (
    CheckpointManager,
    restore_subtree,
)

__all__ = [
    "TrainState",
    "build_optimizer",
    "l2_regularization",
    "learning_rate_schedule",
    "CheckpointManager",
    "restore_subtree",
]
