"""Debug harness for the end-to-end CUB trainer.

Reference: src/debug_CUB.py:146-314 — a copy of base_CUB used as the smoke
harness (scripts/CUB_tensorflow.sh:31-33); here it simply runs base_CUB in
debug mode (2 epochs)."""

from __future__ import annotations

import sys

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.train.trainers.base_CUB import train as _train


def train(cfg: TrainConfig, **kw):
    return _train(cfg, debug=True, **kw)


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
