"""K-means pseudo-labeling from pretrained embeddings.

Reference: src/unimodal_pretrain_cluster.py:23-196 — embed every training
event with a pretrained (Seq2seqTSN) encoder, KMeans(20) cluster, keep the
top-100 closest points per cluster as high-confidence pseudo-labeled train
data (top-20 for val), and pickle {feats, labels, sessions, boundaries}.
"""

from __future__ import annotations

import functools
import os
import pickle
import sys
from datetime import datetime
from typing import Optional

import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.data import (
    load_data_and_label, prepare_dataset, tsn_prepare_input_test)
from multimodal_similarity_tpu.models import Seq2seqTSN
from multimodal_similarity_tpu.train.checkpoints import load_pytree

NUM_CLUSTER = 20
NUM_HIGH = 100
NUM_HIGH_VAL = 20


def _embed_sessions(model, params, dataset, prep, chunk=256):
    feats, sessions, eids = [], [], []
    for row in dataset:
        session_id = os.path.basename(row[-1]).split("_")[0]
        eve, _, bou = load_data_and_label(row[0], row[-1], prep)
        hidden, _ = model.apply({"params": params}, jnp.asarray(eve))
        feats.append(np.asarray(hidden))
        sessions.extend([session_id] * eve.shape[0])
        eids.extend(bou)
    return np.concatenate(feats, axis=0), sessions, eids


def _high_confidence(embeddings, kmeans, sessions, eids, num_high):
    cluster_idx = kmeans.predict(embeddings)
    cluster_dist = kmeans.transform(embeddings)
    feat, label, ses, out_eids = [], [], [], []
    for i in range(NUM_CLUSTER):
        idx = np.where(cluster_idx == i)[0]
        dist = cluster_dist[idx, i]
        idx = idx[np.argsort(dist)[:num_high]]
        temp = embeddings[idx]
        feat.append(temp)
        label.append(i * np.ones((temp.shape[0], 1), dtype="int32"))
        for j in idx:
            ses.append(sessions[j])
            out_eids.append(eids[j])
    return (np.concatenate(feat, axis=0), np.concatenate(label, axis=0),
            ses, out_eids)


def run(cfg: TrainConfig, result_dir: Optional[str] = None):
    from sklearn.cluster import KMeans

    feat = cfg.feat if isinstance(cfg.feat, str) else cfg.feat[0]
    train_set = prepare_dataset(cfg.feature_root, cfg.train_session, feat,
                                cfg.label_root, cfg.label_type)
    val_set = prepare_dataset(cfg.feature_root, cfg.val_session, feat,
                              cfg.label_root, cfg.label_type)
    prep = functools.partial(tsn_prepare_input_test, cfg.num_seg)

    n_input = cfg.feat_dim.get(feat, (8,))[-1]
    model = Seq2seqTSN(n_seg=cfg.num_seg, n_input=n_input,
                       emb_dim=cfg.emb_dim, reverse=cfg.reverse)
    if not cfg.model_path:
        raise ValueError("--model_path (pretrained seq2seq) is required")
    ckpt = load_pytree(cfg.model_path, None)
    params = ckpt.get("params", ckpt)

    emb, sessions, eids = _embed_sessions(model, params, train_set, prep)
    kmeans = KMeans(n_clusters=NUM_CLUSTER, n_init=20, random_state=cfg.seed)
    kmeans.fit(emb)

    feat_hc, label_hc, ses_hc, eids_hc = _high_confidence(
        emb, kmeans, sessions, eids, NUM_HIGH)

    if result_dir is None:
        result_dir = os.path.join(
            os.path.dirname(cfg.model_path),
            "kmeans_" + datetime.now().strftime("%Y%m%d-%H%M%S"))
    os.makedirs(result_dir, exist_ok=True)
    with open(os.path.join(result_dir, "kmeans_model.pkl"), "wb") as f:
        pickle.dump(kmeans, f)
    with open(os.path.join(result_dir, "train_data.pkl"), "wb") as f:
        pickle.dump({"feats": feat_hc, "labels": label_hc,
                     "sessions": ses_hc, "boundaries": eids_hc}, f)

    emb_val, sessions_v, eids_v = _embed_sessions(model, params, val_set,
                                                  prep)
    feat_v, label_v, ses_v, eids_vv = _high_confidence(
        emb_val, kmeans, sessions_v, eids_v, NUM_HIGH_VAL)
    with open(os.path.join(result_dir, "val_data.pkl"), "wb") as f:
        pickle.dump({"feats": feat_v, "labels": label_v,
                     "sessions": ses_v, "boundaries": eids_vv}, f)
    return result_dir


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    run(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
