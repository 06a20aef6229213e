"""Hallucination evaluation: concat the core embedding with the
hallucinated-sensors embedding (both computed from video only).

Reference: src/evaluate_hallucination.py:15-128 (fusion at :59).
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import EvalConfig
from multimodal_similarity_tpu.data import (
    load_validation_set, prepare_dataset, tsn_prepare_input_test)
from multimodal_similarity_tpu.eval.evaluate_model import (
    restore_encoder_params)
from multimodal_similarity_tpu.eval.metrics import evaluate
from multimodal_similarity_tpu.models import build_encoder
from multimodal_similarity_tpu.train.steps import (
    embed_arrays_in_chunks, l2_normalize)

SENSORS_EMB_DIM = 32


def run(cfg: EvalConfig):
    feat = cfg.feat if isinstance(cfg.feat, str) else cfg.feat[0]
    test_set = prepare_dataset(cfg.feature_root, cfg.test_session, feat,
                               cfg.label_root, cfg.label_type)
    prep = functools.partial(tsn_prepare_input_test, cfg.num_seg)
    feats, labels, _, _ = load_validation_set(test_set, prep,
                                              transfer=cfg.transfer)

    core = build_encoder(cfg.network, num_seg=cfg.num_seg,
                         emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                         n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C)
    hal = build_encoder(cfg.network, num_seg=cfg.num_seg,
                        emb_dim=SENSORS_EMB_DIM, n_input=cfg.n_input,
                        n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C)
    core_params = restore_encoder_params(cfg.model_path, "modality_core")
    hal_params = restore_encoder_params(cfg.model_path,
                                        "hallucination_sensors")

    @jax.jit
    def embed(x):
        e = l2_normalize(core.apply({"params": core_params}, x))
        e2 = l2_normalize(hal.apply({"params": hal_params}, x))
        return jnp.concatenate([e, e2], axis=1)

    embeddings = embed_arrays_in_chunks(embed, (feats,))
    mAP, mAP_event, mPrec, confusion, count, recall = evaluate(
        embeddings, labels)
    print("hallucination fusion: mAP = %.4f  mPrec@0.5 = %.4f  "
          "Recall@1 = %.4f" % (mAP, mPrec, recall[0]))
    return {"mAP": mAP, "mAP_event": mAP_event, "mPrec": mPrec,
            "recall": recall}


def main(argv=None):
    cfg = EvalConfig.parse(argv)
    run(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
