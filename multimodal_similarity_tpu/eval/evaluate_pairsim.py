"""PairSim verification accuracy on constructed hard + easy triplet pairs.

Reference: src/evaluate_pairsim.py:23-219 — per test session: mine
anchor-positive pairs with one semi-hard negative (hard) and one far
negative (easy) from the embedding distances, then measure the PairSim
head's accuracy on those (a, p) / (a, n) pairs.
"""

from __future__ import annotations

import functools
import itertools
import random
import sys
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import EvalConfig
from multimodal_similarity_tpu.data import (
    load_data_and_label, prepare_dataset, tsn_prepare_input_test)
from multimodal_similarity_tpu.eval.evaluate_model import (
    restore_encoder_params)
from multimodal_similarity_tpu.models import PairSim, build_encoder
from multimodal_similarity_tpu.ops.distances import pairwise_distance
from multimodal_similarity_tpu.train.steps import (
    embed_arrays_in_chunks, l2_normalize)


def select_eval_triplets(lab, eve_embedding, triplet_per_batch,
                         alpha=0.2, metric="squaredeuclidean",
                         rng=None) -> List[int]:
    """Hard + easy triplet construction (reference :23-92): per a-p pair,
    one semi-hard negative and one far negative (dist - pos > alpha)."""
    rng = rng or random
    # pairwise_distance is one matmul with O(N^2) memory; the all_diffs
    # route materializes an O(N^2 * d) difference tensor first
    all_dist = np.asarray(pairwise_distance(
        jnp.asarray(eve_embedding), jnp.asarray(eve_embedding), metric))
    np_lab = np.asarray(lab).reshape(-1)

    idx_dict: dict = {}
    for i, l in enumerate(np_lab):
        idx_dict.setdefault(int(l), []).append(i)
    for key in idx_dict:
        rng.shuffle(idx_dict[key])
    foreground = {k: itertools.permutations(v, 2)
                  for k, v in idx_dict.items() if k != 0}

    triplet_idx: List[int] = []
    while len(triplet_idx) < triplet_per_batch * 3:
        keys = list(foreground.keys())
        if not keys:
            break
        for key in keys:
            try:
                an_idx, pos_idx = next(foreground[key])
            except StopIteration:
                del foreground[key]
                continue
            pos_dist = all_dist[an_idx, pos_idx]
            neg_dist = np.array(all_dist[an_idx], dtype="float64")
            neg_dist[idx_dict[key]] = np.nan
            with np.errstate(invalid="ignore"):
                hard = np.where((neg_dist - pos_dist < alpha)
                                & (pos_dist < neg_dist))[0]
                easy = np.where(neg_dist - pos_dist > alpha)[0]
            if len(hard) > 0 and len(easy) > 0:
                triplet_idx.extend(
                    [an_idx, pos_idx,
                     int(hard[rng.randrange(len(hard))])])
                triplet_idx.extend(
                    [an_idx, pos_idx,
                     int(easy[rng.randrange(len(easy))])])
    return triplet_idx


def run(cfg: EvalConfig):
    feat = cfg.feat if isinstance(cfg.feat, str) else cfg.feat[0]
    test_set = prepare_dataset(cfg.feature_root, cfg.test_session, feat,
                               cfg.label_root, cfg.label_type)
    prep = functools.partial(tsn_prepare_input_test, cfg.num_seg)

    encoder = build_encoder(cfg.network, num_seg=cfg.num_seg,
                            emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                            n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C)
    enc_params = restore_encoder_params(cfg.model_path, cfg.variable_name,
                                        subkey="encoder")
    head = PairSim(n_input=cfg.emb_dim)
    head_params = restore_encoder_params(cfg.model_path, cfg.variable_name,
                                         subkey="ver")

    @jax.jit
    def embed(x):
        e = encoder.apply({"params": enc_params}, x)
        return l2_normalize(e) if cfg.normalized else e

    @jax.jit
    def pair_prob(a, b):
        _, prob = head.apply({"params": head_params}, a, b, method="score")
        return prob

    correct = total = 0
    per_session = {}
    eval_rng = random.Random(cfg.seed)
    for row in test_set:
        eve, lab, _ = load_data_and_label(row[0], row[-1], prep,
                                          cfg.transfer)
        emb = embed_arrays_in_chunks(embed, (eve,))
        tri = select_eval_triplets(lab, emb, 100, alpha=0.2,
                                   rng=eval_rng)
        if not tri:
            continue
        tri = np.asarray(tri).reshape(-1, 3)
        a = jnp.asarray(emb[tri[:, 0]])
        p = jnp.asarray(emb[tri[:, 1]])
        n = jnp.asarray(emb[tri[:, 2]])
        prob_ap = np.asarray(pair_prob(a, p))
        prob_an = np.asarray(pair_prob(a, n))
        c = int((prob_ap[:, 1] > 0.5).sum() + (prob_an[:, 1] <= 0.5).sum())
        t = 2 * tri.shape[0]
        sess_id = row[0].split("/")[-1].split(".")[0].split("_")[0]
        per_session[sess_id] = c / t
        correct += c
        total += t

    acc = correct / max(total, 1)
    print("PairSim accuracy = %.4f over %d pairs" % (acc, total))
    return {"accuracy": acc, "per_session": per_session, "pairs": total}


def main(argv=None):
    cfg = EvalConfig.parse(argv)
    run(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
