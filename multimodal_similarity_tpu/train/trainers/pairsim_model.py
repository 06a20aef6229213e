"""Standalone PairSim similarity-classifier trainer.

Reference: src/pairsim_model.py:100-337 — random mirrored pos/neg pairs,
cross entropy on the PairSim head over UN-normalized embeddings, plus the
DeepReID hard-pair re-training pass: pairs the model got confidently wrong
(prob of the wrong class > threshold) are immediately re-trained, with the
global step rolled back one so hard steps stay step-neutral
(subtract_global_step_op, reference :126).  Here the rollback is expressed
by not incrementing ``state.step`` on the hard pass.
"""

from __future__ import annotations

import itertools
import random
import sys
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.models import PairSim, build_encoder
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, l2_regularization, learning_rate_schedule)
from multimodal_similarity_tpu.train.trainer import (
    cached_device, epoch_of_step)
from multimodal_similarity_tpu.train.trainers._honda import HondaExperiment
from multimodal_similarity_tpu.train.steps import jit_step


def random_pairs(lab, batch_size: int, num_negative: int = 1,
                 test: bool = False,
                 rng=None) -> Tuple[List[int], List[int]]:
    """Mirrored positive/negative pair sampling (reference :26-73)."""
    rng = random.Random(1) if test else (rng or random)
    np_lab = np.asarray(lab).reshape(-1)
    idx_dict = {}
    for i, l in enumerate(np_lab):
        idx_dict.setdefault(int(l), []).append(i)
    for key in idx_dict:
        rng.shuffle(idx_dict[key])

    foreground = {k: itertools.permutations(v, 2)
                  for k, v in idx_dict.items() if k != 0}
    pair_idx: List[int] = []
    label: List[int] = []
    while len(pair_idx) < batch_size * 2:
        keys = list(foreground.keys())
        if not keys:
            break
        for key in keys:
            try:
                an_idx, pos_idx = next(foreground[key])
            except StopIteration:
                del foreground[key]
                continue
            pair_idx.extend([an_idx, pos_idx, pos_idx, an_idx])
            label.extend([1, 1])
            all_neg = np.where(np_lab != key)[0]
            for _ in range(num_negative):
                neg_idx = int(all_neg[rng.randrange(len(all_neg))])
                pair_idx.extend([an_idx, neg_idx, neg_idx, an_idx])
                label.extend([0, 0])
    return pair_idx, label


def hard_pairs(lab, prob: np.ndarray, threshold: float = 0.9):
    """Confidently-wrong pairs for re-training (reference :75-97)."""
    lab = np.asarray(lab).reshape(-1)
    pair_idx: List[int] = []
    label: List[int] = []
    hard_pos = np.where(np.logical_and(lab, prob[:, 0] > threshold))[0]
    for idx in hard_pos:
        pair_idx.extend([2 * idx, 2 * idx + 1, 2 * idx + 1, 2 * idx])
        label.extend([1, 1])
    hard_neg = np.where(np.logical_and(lab == 0, prob[:, 1] > threshold))[0]
    for idx in hard_neg:
        pair_idx.extend([2 * idx, 2 * idx + 1, 2 * idx + 1, 2 * idx])
        label.extend([0, 0])
    return pair_idx, label, len(hard_neg) + len(hard_pos)


def _pad_pairs(pair_idx, labels, cap: int):
    """Fix-shape a ragged pair list: [2P] indices, [P] labels, [P] mask."""
    p = min(len(labels), cap)
    idx = np.zeros(2 * cap, np.int32)
    lab = np.zeros(cap, np.int32)
    mask = np.zeros(cap, np.float32)
    idx[: 2 * p] = np.asarray(pair_idx[: 2 * p], np.int32)
    lab[:p] = np.asarray(labels[:p], np.int32)
    mask[:p] = 1.0
    return idx, lab, mask


def make_pairsim_step(encoder, head, cfg: TrainConfig):
    def step(state, events, pair_idx, pair_lab, pair_mask, key,
             learning_rate, advance_step):
        k_drop, k_ver = jax.random.split(key)

        def loss_fn(params):
            feats = jnp.take(events, pair_idx, axis=0)
            emb = encoder.apply({"params": params["encoder"]}, feats,
                                train=True, rngs={"dropout": k_drop})
            p = pair_lab.shape[0]
            pairs = emb.reshape(p, 2, -1)
            logits, prob = head.apply(
                {"params": params["ver"]}, pairs[:, 0], pairs[:, 1], True,
                method="score", rngs={"dropout": k_ver})
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(log_probs, pair_lab[:, None], -1)[:, 0]
            denom = jnp.maximum(jnp.sum(pair_mask), 1.0)
            ver_loss = jnp.sum(nll * pair_mask) / denom
            pred = jnp.argmax(logits, -1)
            acc = jnp.sum((pred == pair_lab) * pair_mask) / denom
            total = ver_loss
            if cfg.lambda_l2:
                total = total + cfg.lambda_l2 * l2_regularization(params)
            return total, {"loss": total, "acc": acc, "prob": prob}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, learning_rate=learning_rate)
        # hard-pair passes keep global step unchanged (reference :125-126)
        state = state.replace(step=state.step - 1 + advance_step)
        return state, aux

    return jit_step(step)


def train(cfg: TrainConfig, event_budget: Optional[int] = None,
          result_dir: Optional[str] = None):
    exp = HondaExperiment(cfg, event_budget=event_budget,
                          result_dir=result_dir, limit_label_num=False,
                          val_sessions=cfg.val_session[:3])
    encoder = build_encoder(cfg.network, num_seg=cfg.num_seg,
                            emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                            n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C,
                            keep_prob=cfg.keep_prob)
    head = PairSim(n_input=cfg.emb_dim, keep_prob=cfg.keep_prob)

    x0 = jnp.asarray(np.zeros((2,) + exp.val_feats.shape[1:], np.float32))
    enc_vars = encoder.init(exp.next_key(), x0)
    e0 = jnp.zeros((2, cfg.emb_dim), jnp.float32)
    ver_vars = head.init(exp.next_key(), e0, e0, method="score")
    state = TrainState.create(
        {"encoder": enc_vars["params"], "ver": ver_vars["params"]},
        build_optimizer(cfg.optimizer, cfg.learning_rate))

    step_fn = make_pairsim_step(encoder, head, cfg)
    pair_cap = max(cfg.batch_size * 4, 64)

    # fixed validation pairs (reference seeds random_pairs with test=True)
    val_idx, val_lab = random_pairs(exp.val_labels, 1_000_000, test=True)
    val_idx_a, val_lab_a, val_mask_a = _pad_pairs(val_idx, val_lab,
                                                  len(val_lab))

    @jax.jit
    def evaluate_pairs(params, feats, pair_idx, pair_lab):
        emb = encoder.apply({"params": params["encoder"]},
                            jnp.take(feats, pair_idx, 0))
        p = pair_lab.shape[0]
        pairs = emb.reshape(p, 2, -1)
        logits, prob = head.apply({"params": params["ver"]},
                                  pairs[:, 0], pairs[:, 1], method="score")
        acc = jnp.mean((jnp.argmax(logits, -1) == pair_lab)
                       .astype(jnp.float32))
        return acc, prob

    metrics = {}
    val_prob = None
    # config-seeded pair-sampler stream (independent of global RNG)
    mine_rng = random.Random(cfg.seed)
    epoch = epoch_of_step(int(state.step), exp.batch_per_epoch)
    # exp.close() must run even when the loop raises: it
    # restores the SIGTERM guard and flushes logs/traces
    try:
        while epoch < cfg.max_epochs:
            lr = learning_rate_schedule(epoch, cfg.learning_rate,
                                        cfg.static_epochs, cfg.max_epochs)
            step_at_epoch_start = int(state.step)
            for batch in exp.loader.epoch():
                n = int(batch["num_events"])
                pair_idx, pair_lab = random_pairs(batch["labels"][:n],
                                                  cfg.batch_size,
                                                  cfg.num_negative,
                                                  rng=mine_rng)
                if not pair_lab:
                    continue
                # keep host-side lists in sync with the padded device batch so
                # the returned probs align with hard_pairs' indexing
                pair_idx = pair_idx[: 2 * pair_cap]
                pair_lab = pair_lab[:pair_cap]
                idx, lab, mask = _pad_pairs(pair_idx, pair_lab, pair_cap)
                events = jnp.asarray(batch["events"])
                state, aux = step_fn(state, events, jnp.asarray(idx),
                                     jnp.asarray(lab), jnp.asarray(mask),
                                     exp.next_key(), jnp.float32(lr),
                                     jnp.int32(1))
                negative_count = 0
                if epoch >= cfg.negative_epochs:
                    prob = np.asarray(aux["prob"])[: len(pair_lab)]
                    h_idx, h_lab, negative_count = hard_pairs(
                        np.asarray(pair_lab), prob, 0.5)
                    if negative_count > 0:
                        flat = np.asarray(pair_idx, np.int32)
                        h_pairs = flat[np.asarray(h_idx, np.int32)]
                        hi, hl, hm = _pad_pairs(h_pairs.tolist(), h_lab, pair_cap)
                        state, _ = step_fn(state, events, jnp.asarray(hi),
                                           jnp.asarray(hl), jnp.asarray(hm),
                                           exp.next_key(), jnp.float32(lr),
                                           jnp.int32(0))
                exp.log(int(state.step),
                        {"loss": float(aux["loss"]), "acc": float(aux["acc"]),
                         "negative_count": negative_count, "learning_rate": lr},
                        f"[{cfg.name}] epoch {epoch + 1} step {int(state.step)} "
                        f"loss {float(aux['loss']):.4f} "
                        f"acc {float(aux['acc']):.3f}")
                if exp._guard.should_stop:
                    break
            if exp.preempted(state):
                break
            if int(state.step) == step_at_epoch_start:
                print(f"[{cfg.name}] epoch {epoch + 1}: no trainable batch; stopping")
                break
            val_acc, val_prob = evaluate_pairs(
                state.params, cached_device(exp.val_feats),
                jnp.asarray(val_idx_a), jnp.asarray(val_lab_a))
            metrics = {"val_acc": float(val_acc)}
            exp.log(int(state.step), metrics,
                    f"[{cfg.name}] epoch {epoch + 1} val acc {float(val_acc):.4f}")
            exp.ckpt.save(state, int(state.step))
            epoch = epoch_of_step(int(state.step), exp.batch_per_epoch)

        # final per-pair log (reference :332-337); skipped when a preemption
        # lands before the first validation pass produced any probabilities
        import os
        if val_prob is not None:
            with open(os.path.join(exp.result_dir, "val_results.txt"),
                      "w") as fout:
                fout.write("acc = %.4f\n" % metrics.get("val_acc", 0.0))
                fout.write("label\tprob_0\tprob_1\tA_idx\tB_idx\n")
                prob = np.asarray(val_prob)
                for i in range(prob.shape[0]):
                    fout.write("%d\t%.4f\t%.4f\t%d\t%d\n" % (
                        val_lab_a[i], prob[i, 0], prob[i, 1],
                        val_idx_a[2 * i], val_idx_a[2 * i + 1]))

    finally:
        exp.close()
    return state, metrics, exp.result_dir


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
