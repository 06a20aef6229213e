"""PairSim pretraining on k-means pseudo-labels with a negative-ratio
curriculum.

Reference: src/unimodal_pretrain_pairsim.py:26-233 — consumes the
train_data.pkl produced by unimodal_pretrain_cluster; batches enumerate
same-cluster permutations plus ``phase``-controlled random negatives (the
negative ratio grows over training, :174-185); validation pairs the
highest-confidence point of each cluster against its positives and random
negatives (:75-91).
"""

from __future__ import annotations

import itertools
import os
import pickle
import sys
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.models import PairSim
from multimodal_similarity_tpu.train.checkpoints import CheckpointManager
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, learning_rate_schedule)
from multimodal_similarity_tpu.train.steps import jit_step
from multimodal_similarity_tpu.train.trainer import setup_experiment
from multimodal_similarity_tpu.utils.logging import MetricsLogger


def enumerate_batch(labels: np.ndarray, num_pos: int, phase: float,
                    rng=None):
    """Curriculum pair batches (reference :26-64): per block of ``num_pos``
    rows, all same-cluster permutations plus phase * len(perm) negatives."""
    rng = rng or np.random
    labels = np.asarray(labels).reshape(-1)
    label_num = int(np.max(labels)) + 1
    all_idx = np.transpose(
        np.arange(len(labels)).reshape(-1, len(labels) // label_num))

    for start, end in zip(range(0, all_idx.shape[0], num_pos),
                          range(num_pos, all_idx.shape[0] + num_pos,
                                num_pos)):
        end = min(end, all_idx.shape[0])
        idx = range(start, end)
        perm = list(itertools.permutations(idx, 2))
        a_idx: List[int] = []
        b_idx: List[int] = []
        for i in range(label_num):
            for p in perm:
                a_idx.append(all_idx[p[0], i])
                b_idx.append(all_idx[p[1], i])
            neg_num = int(phase * len(perm))
            neg_label = [l for l in range(label_num) if l != i]
            for _ in range(neg_num):
                temp = rng.randint(start, end)
                a_idx.append(all_idx[temp, i])
                b_idx.append(all_idx[
                    temp, neg_label[rng.randint(len(neg_label))]])
        yield a_idx, b_idx


def prepare_val(labels: np.ndarray,
                rng=None) -> Tuple[List[int], List[int]]:
    """Validation pairs (reference :66-91)."""
    rng = rng or np.random
    labels = np.asarray(labels).reshape(-1)
    a_idx: List[int] = []
    b_idx: List[int] = []
    for l in sorted(set(labels.tolist())):
        idx = np.where(labels == l)[0]
        count = 0
        for p in itertools.permutations(idx, 2):
            if p[0] != idx[0]:
                break
            a_idx.append(p[0])
            b_idx.append(p[1])
            count += 1
        neg_idx = np.where(labels != l)[0]
        for _ in range(count):
            a_idx.append(idx[0])
            b_idx.append(int(neg_idx[rng.randint(len(neg_idx))]))
    return a_idx, b_idx


def _pair_labels(labels, a_idx, b_idx):
    labels = np.asarray(labels).reshape(-1)
    a = np.asarray(a_idx, dtype=np.int64)
    b = np.asarray(b_idx, dtype=np.int64)
    return (labels[a] == labels[b]).astype(np.int32)


def train(cfg: TrainConfig, train_data_path: Optional[str] = None,
          result_dir: Optional[str] = None):
    """train_data_path -- kmeans train_data.pkl (defaults to
    dirname(model_path)/train_data.pkl)."""
    train_data_path = train_data_path or os.path.join(
        os.path.dirname(cfg.model_path or ""), "train_data.pkl")
    with open(train_data_path, "rb") as f:
        data = pickle.load(f)
    feats = np.asarray(data["feats"], np.float32)
    labels = np.asarray(data["labels"]).reshape(-1)

    # enumerate_batch assumes equal cluster sizes (the reference's reshape,
    # :38); trim every cluster to the smallest count
    counts = np.bincount(labels)
    m = int(counts[counts > 0].min())
    keep = np.concatenate([np.where(labels == l)[0][:m]
                           for l in np.unique(labels)])
    order = np.argsort(labels[keep], kind="stable")
    keep = keep[order]
    feats, labels = feats[keep], labels[keep]

    val_path = os.path.join(os.path.dirname(train_data_path), "val_data.pkl")
    if os.path.exists(val_path):
        with open(val_path, "rb") as f:
            vdata = pickle.load(f)
        val_feats = np.asarray(vdata["feats"], np.float32)
        val_labels = np.asarray(vdata["labels"]).reshape(-1)
    else:
        val_feats, val_labels = feats, labels

    result_dir = setup_experiment(cfg, result_dir=result_dir)
    logger = MetricsLogger(result_dir)
    ckpt = CheckpointManager(result_dir, cfg.name)

    head = PairSim(n_input=feats.shape[1], keep_prob=cfg.keep_prob)
    e0 = jnp.zeros((2, feats.shape[1]), jnp.float32)
    variables = head.init(jax.random.PRNGKey(cfg.seed), e0, e0,
                          method="score")
    state = TrainState.create(variables["params"],
                              build_optimizer(cfg.optimizer,
                                              cfg.learning_rate))

    @jit_step
    def step(state, a, b, lab, key, learning_rate):
        def loss_fn(params):
            logits, _ = head.apply({"params": params}, a, b, True,
                                   method="score", rngs={"dropout": key})
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(log_probs, lab[:, None], -1)[:, 0]
            acc = jnp.mean((jnp.argmax(logits, -1) == lab)
                           .astype(jnp.float32))
            return jnp.mean(nll), acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return (state.apply_gradients(grads, learning_rate=learning_rate),
                loss, acc)

    @jax.jit
    def evaluate(params, a, b, lab):
        logits, _ = head.apply({"params": params}, a, b, method="score")
        return jnp.mean((jnp.argmax(logits, -1) == lab).astype(jnp.float32))

    sample_rng = np.random.RandomState(cfg.seed)
    val_a, val_b = prepare_val(val_labels, rng=sample_rng)
    if not val_a:  # degenerate tiny clusters: no permutations available
        val_a, val_b = [0], [0]
    val_lab = _pair_labels(val_labels, val_a, val_b)

    rng = jax.random.PRNGKey(cfg.seed)
    metrics = {}
    loss = acc = jnp.float32(0.0)  # all batches may be degenerate-empty
    for epoch in range(cfg.max_epochs):
        lr = learning_rate_schedule(epoch, cfg.learning_rate,
                                    cfg.static_epochs, cfg.max_epochs)
        # curriculum: negative ratio grows with epoch (reference :174-185)
        phase = min(0.5 + epoch / max(cfg.max_epochs, 1), 2.0)
        for a_idx, b_idx in enumerate_batch(labels, num_pos=5, phase=phase,
                                            rng=sample_rng):
            if not a_idx:
                continue
            lab = _pair_labels(labels, a_idx, b_idx)
            rng, key = jax.random.split(rng)
            state, loss, acc = step(
                state, jnp.asarray(feats[np.asarray(a_idx)]),
                jnp.asarray(feats[np.asarray(b_idx)]),
                jnp.asarray(lab), key, jnp.float32(lr))
        val_acc = float(evaluate(state.params,
                                 jnp.asarray(val_feats[np.asarray(val_a)]),
                                 jnp.asarray(val_feats[np.asarray(val_b)]),
                                 jnp.asarray(val_lab)))
        metrics = {"loss": float(loss), "acc": float(acc),
                   "val_acc": val_acc, "phase": phase}
        logger.log(int(state.step), metrics)
        if not cfg.silent_mode:
            print(f"[{cfg.name}] epoch {epoch + 1} loss {float(loss):.4f} "
                  f"acc {float(acc):.3f} val_acc {val_acc:.3f}")
        ckpt.save(state, int(state.step))

    logger.close()
    return state, metrics, result_dir


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
