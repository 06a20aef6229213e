"""Hard-mining-only ablation of the flagship multimodal trainer.

Reference: src/multimodal_model_hardonly.py:247-657 — identical pipeline to
multimodal_model but without the structure-mining term (loss at reference
:369-393)."""

from __future__ import annotations

import sys

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.train.trainers.multimodal_model import train as _train


def train(cfg: TrainConfig, **kw):
    return _train(cfg, hard_only=True, **kw)


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg, device_mining=cfg.device_mining)


if __name__ == "__main__":
    main(sys.argv[1:])
