"""Checkpoint evaluation: embed test sessions and run full leave-one-out
retrieval.

Reference: src/evaluate_model.py:16-134 — builds the encoder from flags,
restores a checkpoint (optionally pulling one scope of a multi-branch
checkpoint via --variable_name, the prefix-remap trick at reference
:59-63), embeds every test session with test-time TSN sampling, runs
``evaluate`` and dumps results.pkl.

Run:  python -m multimodal_similarity_tpu.eval.evaluate_model \
          --DATA_ROOT ... --model_path <ckpt> --network convrtsn ...
"""

from __future__ import annotations

import functools
import os
import pickle
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import EvalConfig
from multimodal_similarity_tpu.data import (
    load_validation_set, prepare_dataset, tsn_prepare_input_test)
from multimodal_similarity_tpu.data.honda import HONDA_NUM2LABELS
from multimodal_similarity_tpu.eval.metrics import evaluate
from multimodal_similarity_tpu.models import build_encoder
from multimodal_similarity_tpu.train.checkpoints import load_pytree
from multimodal_similarity_tpu.train.steps import embed_in_chunks
from multimodal_similarity_tpu.train.steps import l2_normalize


def restore_encoder_params(model_path: str, variable_name: str = "",
                           subkey: Optional[str] = None):
    """Load checkpoint params; optionally select scope ``variable_name``
    (e.g. 'modality_core') and/or a nested ``subkey`` (e.g. 'encoder')."""
    ckpt = load_pytree(model_path, None)
    params = ckpt.get("params", ckpt)
    if variable_name:
        params = params[variable_name.strip("/")]
    if subkey and subkey in params:
        params = params[subkey]
    return params


def run(cfg: EvalConfig, data=None):
    feat = cfg.feat if isinstance(cfg.feat, str) else cfg.feat[0]
    if data is None:
        test_set = prepare_dataset(cfg.feature_root, cfg.test_session, feat,
                                   cfg.label_root, cfg.label_type)
        feats, labels, sess, bound = load_validation_set(
            test_set, functools.partial(tsn_prepare_input_test, cfg.num_seg),
            transfer=cfg.transfer)
    else:
        feats, labels = data

    params = restore_encoder_params(cfg.model_path, cfg.variable_name)
    if cfg.use_output:
        # classifier checkpoints: use the softmax-head logits as the
        # embedding (reference --use_output, eval_config.py:24-25);
        # head width comes from the checkpoint itself
        from multimodal_similarity_tpu.models import ConvTSNClassifier
        n_output = int(np.asarray(params["head"]["kernel"]).shape[1])
        model = ConvTSNClassifier(n_seg=cfg.num_seg, emb_dim=cfg.emb_dim,
                                  n_input=cfg.n_input, n_h=cfg.n_h,
                                  n_w=cfg.n_w, n_C=cfg.n_C,
                                  n_output=n_output)
    else:
        model = build_encoder(cfg.network, num_seg=cfg.num_seg,
                              emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                              n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C)

    @jax.jit
    def embed(p, x):
        if cfg.use_output:
            _, e = model.apply({"params": p}, x)
        else:
            e = model.apply({"params": p}, x)
        return l2_normalize(e) if cfg.normalized else e

    # chunked like every trainer's eval pass: a full Honda test split is
    # ~GBs of 8x8x1536 features, far too large for one device batch
    embeddings = embed_in_chunks(embed, params, feats)
    mAP, mAP_event, mPrec, confusion, count, recall = evaluate(
        embeddings, labels)

    print("%d events in total" % embeddings.shape[0])
    print("mAP = %.4f" % mAP)
    mAP_macro = float(np.mean(list(mAP_event.values())))
    print("mAP_macro = %.4f" % mAP_macro)
    for key in sorted(mAP_event.keys()):
        name = HONDA_NUM2LABELS.get(key, str(key))
        print("%s: %.4f" % (name, mAP_event[key]))
    print("mPrec@0.5 = %.4f" % mPrec)
    for k, r in zip((1, 2, 4, 8, 16, 32), recall):
        print("Recall@%d = %.4f" % (k, r))

    results = {"mAP": mAP, "mAP_event": mAP_event, "mAP_macro": mAP_macro,
               "mPrec": mPrec, "confusion": confusion, "count": count,
               "recall": recall}
    out_dir = os.path.dirname(cfg.model_path)
    with open(os.path.join(out_dir, "results.pkl"), "wb") as f:
        pickle.dump(results, f)
    return results


def main(argv=None):
    cfg = EvalConfig.parse(argv)
    run(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
