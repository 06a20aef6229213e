"""Sensors-only hallucination with staged loss lambdas.

Reference: src/modality_hallucination_weak.py:142-144 — identical to
modality_hallucination restricted to the sensors branch, with
lambda_metric / lambda_hal placeholders staging the two loss terms.
"""

from __future__ import annotations

import sys

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.train.trainers.modality_hallucination import (
    train as _train)


def train(cfg: TrainConfig, lambda_metric: float = 1.0,
          lambda_hal: float = 1.0, **kw):
    return _train(cfg, sensors_only=True, lambda_metric=lambda_metric,
                  lambda_hal=lambda_hal, **kw)


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
