"""Export a trained checkpoint + dataset into a saved RetrievalIndex.

The deployment on-ramp the reference never had: its retrieval state died
with the evaluation process (evaluate_model.py only pickles metric
results, reference :127-134), so every restart re-embedded the world.
This CLI walks a checkpoint over a session split once, builds a
(optionally int8, quarter-HBM) gallery with per-event metadata
(session/label/frame boundaries), and persists it via
``RetrievalIndex.save`` — a server then calls ``RetrievalIndex.load``
and serves byte-identical top-k with no model in sight.

Run:  python -m multimodal_similarity_tpu.eval.export_index \
          --DATA_ROOT ... --model_path <ckpt> --network convrtsn \
          --index_dir /path/to/index --int8_gallery --index_split test
"""

from __future__ import annotations

import argparse
import functools
import sys

import jax
import numpy as np

from multimodal_similarity_tpu.configs import EvalConfig
from multimodal_similarity_tpu.data import (
    load_validation_set, prepare_dataset, tsn_prepare_input_test)
from multimodal_similarity_tpu.eval.evaluate_model import (
    restore_encoder_params)
from multimodal_similarity_tpu.models import build_encoder
from multimodal_similarity_tpu.serving import RetrievalIndex
from multimodal_similarity_tpu.train.steps import (
    embed_in_chunks, l2_normalize)


def run(cfg: EvalConfig, index_dir: str, int8_gallery: bool = False,
        split: str = "test", data=None):
    """Embed the split's sessions and save the index; returns its path."""
    feat = cfg.feat if isinstance(cfg.feat, str) else cfg.feat[0]
    if data is None:
        sessions = {"train": cfg.train_session, "val": cfg.val_session,
                    "test": cfg.test_session, "all": cfg.all_session}[split]
        dataset = prepare_dataset(cfg.feature_root, sessions, feat,
                                  cfg.label_root, cfg.label_type)
        feats, labels, sess, bound = load_validation_set(
            dataset, functools.partial(tsn_prepare_input_test, cfg.num_seg),
            transfer=cfg.transfer)
    else:
        feats, labels, sess, bound = data

    params = restore_encoder_params(cfg.model_path, cfg.variable_name)
    model = build_encoder(cfg.network, num_seg=cfg.num_seg,
                          emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                          n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C)

    @jax.jit
    def embed(p, x):
        e = model.apply({"params": p}, x)
        return l2_normalize(e) if cfg.normalized else e

    embeddings = embed_in_chunks(embed, params, feats)
    labels = np.asarray(labels).reshape(-1)
    metadata = [
        {"session": s, "label": int(l), "start": int(b[0]), "end": int(b[1])}
        for s, l, b in zip(sess, labels, bound)]
    index = RetrievalIndex(emb_dim=embeddings.shape[1], metric=cfg.metric
                           if hasattr(cfg, "metric") else "euclidean",
                           int8_gallery=int8_gallery)
    index.add(embeddings, metadata)
    path = index.save(index_dir)
    print(f"[export_index] {len(index)} events -> {path} "
          f"({'int8' if int8_gallery else 'f32'} gallery, "
          f"emb_dim {embeddings.shape[1]})")
    return path


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    extra = argparse.ArgumentParser(add_help=False)
    # not `required=True`: --help must reach EvalConfig's parser below
    # instead of dying on the missing --index_dir
    extra.add_argument("--index_dir", type=str, default="")
    extra.add_argument("--int8_gallery", action="store_true")
    extra.add_argument("--index_split", type=str, default="test",
                       choices=("train", "val", "test", "all"))
    ns, rest = extra.parse_known_args(argv)
    if "--help" in rest or "-h" in rest:
        print("export_index extras: --index_dir DIR (required), "
              "--int8_gallery, --index_split {train,val,test,all}\n"
              "plus every EvalConfig flag:")
    elif not ns.index_dir:
        extra.error("the following arguments are required: --index_dir")
    cfg = EvalConfig.parse(rest)
    run(cfg, ns.index_dir, int8_gallery=ns.int8_gallery,
        split=ns.index_split)


if __name__ == "__main__":
    main(sys.argv[1:])
