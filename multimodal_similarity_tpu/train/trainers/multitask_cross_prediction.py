"""Triplet + cross-modal MSE prediction multitask.

Reference: src/multitask_cross_prediction.py:25-390 — same pipeline as
multitask_dcca with OutputLayer heads regressing the frozen sensors/segment
embeddings from the core embedding (heads :74-77, MSE :140-147).  The
reference's segment-MSE-vs-sensors target bug (:142) is fixed to the
intended target (see multitask_dcca.train docstring).
"""

from __future__ import annotations

import sys

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.train.trainers.multitask_dcca import train as _train


def train(cfg: TrainConfig, **kw):
    return _train(cfg, use_mse=True, **kw)


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
