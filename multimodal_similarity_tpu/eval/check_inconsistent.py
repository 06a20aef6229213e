"""Dump high-confidence mispredictions of a similarity head.

Reference: src/check_inconsistent_pairsim.py:22-108 and
src/check_inconsistent_pddm.py:22-135 — for every labeled pair on the test
sessions, find pairs where the head is confidently wrong:
  false positives: different labels but P(similar) > threshold;
  false negatives: same label but P(dissimilar) > threshold.
Outputs a pickle of (session, index_a, index_b, label_a, label_b, prob).
"""

from __future__ import annotations

import functools
import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import EvalConfig
from multimodal_similarity_tpu.data import (
    load_data_and_label, prepare_dataset, tsn_prepare_input_test)
from multimodal_similarity_tpu.eval.evaluate_model import (
    restore_encoder_params)
from multimodal_similarity_tpu.models import PDDM, PairSim, build_encoder, \
    score_all_pairs, score_all_pairs_sym
from multimodal_similarity_tpu.train.steps import (
    embed_arrays_in_chunks, l2_normalize)


def run(cfg: EvalConfig, head_kind: str = "pddm", threshold: float = 0.9):
    feat = cfg.feat if isinstance(cfg.feat, str) else cfg.feat[0]
    test_set = prepare_dataset(cfg.feature_root, cfg.test_session, feat,
                               cfg.label_root, cfg.label_type)
    prep = functools.partial(tsn_prepare_input_test, cfg.num_seg)

    encoder = build_encoder(cfg.network, num_seg=cfg.num_seg,
                            emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                            n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C)
    enc_params = restore_encoder_params(cfg.model_path, cfg.variable_name,
                                        subkey="encoder")
    head_cls = PDDM if head_kind == "pddm" else PairSim
    head = head_cls(n_input=cfg.emb_dim)
    head_params = restore_encoder_params(
        cfg.model_path, cfg.variable_name,
        subkey="pddm" if head_kind == "pddm" else "ver")

    @jax.jit
    def embed(x):
        e = encoder.apply({"params": enc_params}, x)
        return l2_normalize(e) if cfg.normalized else e

    score_fn = functools.partial(head.apply, {"params": head_params},
                                 method="score")

    false_pos, false_neg = [], []
    for row in test_set:
        eve, lab, _ = load_data_and_label(row[0], row[-1], prep,
                                          cfg.transfer)
        lab = lab.reshape(-1)
        emb = jnp.asarray(embed_arrays_in_chunks(embed, (eve,)))
        # PDDM is swap-symmetric -> half the head evaluations; PairSim
        # (concat order matters) must score every ordered pair
        scorer = (score_all_pairs_sym if head_kind == "pddm"
                  else score_all_pairs)
        sim = np.asarray(scorer(
            lambda a, b: score_fn(a, b), emb,
            block=min(64, emb.shape[0])))
        sess_id = os.path.basename(row[0]).split(".")[0].split("_")[0]
        n = lab.shape[0]
        for i in range(n):
            for j in range(i + 1, n):
                same = lab[i] == lab[j]
                if not same and sim[i, j] > threshold:
                    false_pos.append((sess_id, i, j, int(lab[i]),
                                      int(lab[j]), float(sim[i, j])))
                elif same and (1.0 - sim[i, j]) > threshold:
                    false_neg.append((sess_id, i, j, int(lab[i]),
                                      int(lab[j]), float(sim[i, j])))

    print(f"{head_kind}: {len(false_pos)} confident false positives, "
          f"{len(false_neg)} confident false negatives "
          f"(threshold {threshold})")
    out_dir = os.path.dirname(cfg.model_path)
    out_path = os.path.join(out_dir, f"inconsistent_{head_kind}.pkl")
    with open(out_path, "wb") as f:
        pickle.dump({"false_pos": false_pos, "false_neg": false_neg}, f)
    return {"false_pos": false_pos, "false_neg": false_neg}


def main(argv=None):
    # allow --head pairsim|pddm as a leading arg without disturbing EvalConfig
    head_kind = "pddm"
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--head" in argv:
        i = argv.index("--head")
        if i + 1 >= len(argv):
            sys.exit("usage: --head {pairsim|pddm} (missing value)")
        head_kind = argv[i + 1]
        del argv[i:i + 2]
    cfg = EvalConfig.parse(argv)
    run(cfg, head_kind=head_kind)


if __name__ == "__main__":
    main()
