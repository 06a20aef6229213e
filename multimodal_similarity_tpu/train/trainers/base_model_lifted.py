"""Lifted-structured loss trainer (reference src/base_model_lifted.py:68-255).

Same class-balanced batch pipeline as the batch-hard trainer with the
lifted-structured objective (loss at reference :119).
"""

from __future__ import annotations

import sys

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.train.trainers.base_model_batchhard import train as _train


def train(cfg: TrainConfig, **kw):
    return _train(cfg, loss_kind="lifted", **kw)


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
