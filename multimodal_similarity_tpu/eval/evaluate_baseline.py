"""No-model retrieval baseline: mean/max-pooled raw features.

Reference: src/evaluate.py:36-78 — pools each event's raw frames
(--preprocess_func mean | max), then runs the full evaluation.
"""

from __future__ import annotations

import sys

import numpy as np

from multimodal_similarity_tpu.configs import EvalConfig
from multimodal_similarity_tpu.data import (
    load_validation_set, max_pool_input, mean_pool_input, prepare_dataset)
from multimodal_similarity_tpu.eval.metrics import evaluate


def run(cfg: EvalConfig):
    feat = cfg.feat if isinstance(cfg.feat, str) else cfg.feat[0]
    prep = mean_pool_input if cfg.preprocess_func == "mean" else \
        max_pool_input
    test_set = prepare_dataset(cfg.feature_root, cfg.test_session, feat,
                               cfg.label_root, cfg.label_type)
    feats, labels, _, _ = load_validation_set(test_set, prep,
                                              transfer=cfg.transfer)
    feats = feats.reshape(feats.shape[0], -1)
    if cfg.normalized:
        feats = feats / np.maximum(
            np.linalg.norm(feats, axis=1, keepdims=True), 1e-10)
    mAP, mAP_event, mPrec, confusion, count, recall = evaluate(feats, labels)
    print("mAP = %.4f  mPrec@0.5 = %.4f  Recall@1 = %.4f"
          % (mAP, mPrec, recall[0]))
    return {"mAP": mAP, "mAP_event": mAP_event, "mPrec": mPrec,
            "recall": recall}


def main(argv=None):
    cfg = EvalConfig.parse(argv)
    return run(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
