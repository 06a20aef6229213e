"""Late-fusion evaluation: concat the core embedding with an auxiliary
branch embedding before retrieval.

Reference: src/evaluate_late_fusion.py:14-148 — the auxiliary embedding is
either the sensors RTSN branch applied to real sensor features, or a
cross-prediction model's regressed output (fusion at reference :115).
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import EvalConfig
from multimodal_similarity_tpu.data import (
    load_validation_set, prepare_multimodal_dataset, tsn_prepare_input_test)
from multimodal_similarity_tpu.eval.evaluate_model import (
    restore_encoder_params)
from multimodal_similarity_tpu.eval.metrics import evaluate
from multimodal_similarity_tpu.models import RTSN, build_encoder
from multimodal_similarity_tpu.train.steps import (
    embed_arrays_in_chunks, l2_normalize)

SENSORS_EMB_DIM = 32


def run(cfg: EvalConfig, sensors_n_input: int = 8):
    feats_list = cfg.feat if isinstance(cfg.feat, list) else \
        ["resnet", "sensors"]
    test_set = prepare_multimodal_dataset(
        cfg.feature_root, cfg.test_session, feats_list, cfg.label_root,
        cfg.label_type)
    prep = functools.partial(tsn_prepare_input_test, cfg.num_seg)
    feats, labels, _, _ = load_validation_set(
        [[r[0], r[-1]] for r in test_set], prep, transfer=cfg.transfer)
    if not cfg.use_output:
        # the cross-predicted mode derives the aux embedding from the core
        # features alone — don't load/upload the second modality there
        feats2, _, _, _ = load_validation_set(
            [[r[1], r[-1]] for r in test_set], prep, transfer=cfg.transfer)

    core = build_encoder(cfg.network, num_seg=cfg.num_seg,
                         emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                         n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C)
    core_params = restore_encoder_params(cfg.model_path, cfg.variable_name)

    if cfg.use_output:
        # cross-prediction fusion: the aux embedding is the regression
        # head's output on the core embedding (the reference's
        # cross-predicted late-fusion mode); sensors_path holds a
        # cross_prediction checkpoint with {encoder, head} subtrees
        from multimodal_similarity_tpu.models import OutputLayer

        cp_enc_params = restore_encoder_params(cfg.sensors_path,
                                               subkey="encoder")
        cp_head_params = restore_encoder_params(cfg.sensors_path,
                                                subkey="head")
        head_dim = int(np.asarray(
            cp_head_params["out"]["kernel"]).shape[1])
        cp_head = OutputLayer(n_output=head_dim)

        @jax.jit
        def embed(x):
            e = l2_normalize(core.apply({"params": core_params}, x))
            hidden = core.apply({"params": cp_enc_params}, x)
            pred = cp_head.apply({"params": cp_head_params},
                                 jax.nn.relu(hidden))
            return jnp.concatenate([e, l2_normalize(pred)], axis=1)

        embeddings = embed_arrays_in_chunks(embed, (feats,))
    else:
        sensors = RTSN(n_seg=cfg.num_seg, emb_dim=SENSORS_EMB_DIM,
                       n_input=sensors_n_input)
        sensors_params = restore_encoder_params(cfg.sensors_path,
                                                subkey="encoder")

        @jax.jit
        def embed(x, x2):
            e = l2_normalize(core.apply({"params": core_params}, x))
            e2 = l2_normalize(sensors.apply({"params": sensors_params}, x2))
            return jnp.concatenate([e, e2], axis=1)

        embeddings = embed_arrays_in_chunks(embed, (feats, feats2))
    mAP, mAP_event, mPrec, confusion, count, recall = evaluate(
        embeddings, labels)
    print("late fusion: mAP = %.4f  mPrec@0.5 = %.4f  Recall@1 = %.4f"
          % (mAP, mPrec, recall[0]))
    return {"mAP": mAP, "mAP_event": mAP_event, "mPrec": mPrec,
            "recall": recall}


def main(argv=None):
    cfg = EvalConfig.parse(argv)
    run(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
