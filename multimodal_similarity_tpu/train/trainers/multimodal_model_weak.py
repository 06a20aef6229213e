"""Weak / semi-supervised multimodal trainer.

Reference: src/multimodal_model_weak.py:142-493 — separate unimodal and
multimodal objectives: facenet triplets on labeled sessions drive a plain
triplet loss; triplets mined purely from PDDM pseudo-similarities on
unlabeled data drive triplet + lambda_multimodal * weighted_triplet_loss
with the PDDM 4-way probabilities as confidences (:244-264).  Selection
policy per --multimodal_select: confidence | random | nopos (:25-126).
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
from multimodal_similarity_tpu.models import PDDM, RTSN, build_encoder
from multimodal_similarity_tpu.ops.distances import all_diffs, cdist
from multimodal_similarity_tpu.ops.losses import (
    triplet_loss_masked, weighted_triplet_loss_per_triplet)
from multimodal_similarity_tpu.ops.mining import select_triplets_facenet
from multimodal_similarity_tpu.train.checkpoints import load_pytree
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, l2_regularization, learning_rate_schedule)
from multimodal_similarity_tpu.train.steps import (
    jit_step, l2_normalize, make_embed_fn)
from multimodal_similarity_tpu.train.trainer import (
    cached_device, epoch_of_step)
from multimodal_similarity_tpu.train.trainers._honda import HondaExperiment
from multimodal_similarity_tpu.train.trainers.multimodal_model import (
    SENSORS_EMB_DIM, _graft)


def select_triplets_multimodal(sim_prob, threshold=0.8, max_num=1000,
                               rng=None):
    """High-confidence pseudo-label triplets (reference :98-126).

    NOTE: the reference permutes the matrix rows and then emits the
    permuted row index as the anchor while columns stay unpermuted — a
    row/column index-space mix-up.  Intended semantics (anchors visited in
    random order, indices in the original space) used here (SURVEY.md §7).
    """
    rng = rng or np.random
    mul_idx: List[int] = []
    count = 0
    for i in rng.permutation(sim_prob.shape[0]):
        row = sim_prob[i]
        pos_idx = np.where(row > threshold)[0]
        neg_idx = np.where(row < (1 - threshold))[0]
        if len(pos_idx) and len(neg_idx):
            neg_idx = np.argsort(row)[: len(pos_idx)]
            high_confidence = np.hstack((pos_idx, neg_idx))
            rng.shuffle(high_confidence)
            for pair in itertools.combinations(high_confidence, 2):
                mul_idx.extend([i, pair[0], pair[1]])
                count += 1
                if count == max_num:
                    return mul_idx, count
    return mul_idx, count


def random_triplets_multimodal(sim_prob, max_num=1000, rng=None):
    """Random pseudo-triplets from rows with >1 positives (reference
    :62-96; same index-space fix as select_triplets_multimodal)."""
    rng = rng or np.random
    pos_rows = np.where(np.sum(sim_prob > 0.5, axis=1) > 1)[0]
    rng.shuffle(pos_rows)
    mul_idx: List[int] = []
    count = 0
    for i in pos_rows:
        pos_idx = np.where(sim_prob[i] > 0.5)[0]
        neg_idx = np.where(sim_prob[i] < 0.5)[0]
        rng.shuffle(neg_idx)
        neg_idx = neg_idx[: len(pos_idx)]
        idx = np.hstack((pos_idx, neg_idx))
        rng.shuffle(idx)
        perm2 = itertools.permutations(idx, 2)
        for _ in range(int(np.ceil(max_num / max(len(pos_rows), 1)))):
            try:
                pair = next(perm2)
            except StopIteration:
                break
            mul_idx.extend([i, pair[0], pair[1]])
            count += 1
            if count == max_num:
                return mul_idx, count
    return mul_idx, count


def nopos_triplets_multimodal(sim_prob, max_num=1000, rng=None):
    """Random pseudo-triplets without the positive-row constraint
    (reference :25-60; same index-space fix)."""
    rng = rng or np.random
    mul_idx: List[int] = []
    count = 0
    for i in rng.permutation(sim_prob.shape[0]):
        pos_idx = np.where(sim_prob[i] > 0.5)[0]
        neg_idx = np.where(sim_prob[i] < 0.5)[0]
        rng.shuffle(neg_idx)
        if len(pos_idx):
            neg_idx = neg_idx[: len(pos_idx)]
            idx = np.hstack((pos_idx, neg_idx))
        else:
            idx = neg_idx[:8]
        rng.shuffle(idx)
        perm2 = itertools.permutations(idx, 2)
        for _ in range(int(np.ceil(max_num / sim_prob.shape[0]))):
            try:
                pair = next(perm2)
            except StopIteration:
                break
            mul_idx.extend([i, pair[0], pair[1]])
            count += 1
            if count == max_num:
                return mul_idx, count
    return mul_idx, count


def make_weak_steps(core, sensors_enc, sensors_pddm, cfg: TrainConfig,
                    tri_cap: int):
    """(unimodal_step, multimodal_step) — the two train ops of the
    reference (:260-264)."""

    def uni_step(state, tri_events, mask, key, learning_rate):
        def loss_fn(params):
            emb = core.apply({"params": params["modality_core"]}, tri_events,
                             train=True, rngs={"dropout": key})
            if cfg.normalized:
                emb = l2_normalize(emb)
            tri = emb.reshape(tri_cap, 3, -1)
            loss1 = triplet_loss_masked(tri[:, 0], tri[:, 1], tri[:, 2],
                                        mask, cfg.alpha)
            total = loss1
            if cfg.lambda_l2:
                total = total + cfg.lambda_l2 * l2_regularization(params)
            return total, {"loss": total, "metric_loss1": loss1}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, learning_rate=learning_rate), aux

    def mm_step(state, tri_events, tri_sensors, mask, key, learning_rate):
        def loss_fn(params):
            emb = core.apply({"params": params["modality_core"]}, tri_events,
                             train=True, rngs={"dropout": key})
            if cfg.normalized:
                emb = l2_normalize(emb)
            tri = emb.reshape(tri_cap, 3, -1)
            a, p, n = tri[:, 0], tri[:, 1], tri[:, 2]
            loss2 = triplet_loss_masked(a, p, n, mask, cfg.alpha)

            es = sensors_enc.apply(
                {"params": params["modality_sensors"]["encoder"]},
                tri_sensors)
            est = es.reshape(tri_cap, 3, -1)
            _, prob_ab = sensors_pddm.apply(
                {"params": params["modality_sensors"]["pddm"]},
                est[:, 0], est[:, 1], method="score")
            _, prob_ac = sensors_pddm.apply(
                {"params": params["modality_sensors"]["pddm"]},
                est[:, 0], est[:, 2], method="score")
            w_vec, _ = weighted_triplet_loss_per_triplet(
                a, p, n, prob_ab[:, 1], prob_ac[:, 1], cfg.alpha)
            denom = jnp.maximum(jnp.sum(mask), 1.0)
            w_loss = jnp.sum(w_vec * mask) / denom

            total = loss2 + cfg.lambda_multimodal * w_loss
            if cfg.lambda_l2:
                total = total + cfg.lambda_l2 * l2_regularization(params)
            return total, {"loss": total, "metric_loss2": loss2,
                           "weighted_loss": w_loss}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads, learning_rate=learning_rate), aux

    return jit_step(uni_step), jit_step(mm_step)


def _pad_flat(idx: List[int], tri_cap: int) -> Tuple[np.ndarray, np.ndarray]:
    t = min(len(idx) // 3, tri_cap)
    gather = np.zeros(3 * tri_cap, np.int32)
    gather[: 3 * t] = np.asarray(idx[: 3 * t], np.int32)
    mask = np.zeros(tri_cap, np.float32)
    mask[:t] = 1.0
    return gather, mask


def train(cfg: TrainConfig, event_budget: Optional[int] = None,
          result_dir: Optional[str] = None):
    modalities = cfg.feat if isinstance(cfg.feat, list) else \
        ["resnet", "sensors"]
    if len(modalities) < 2:
        modalities = ["resnet", "sensors"]
    exp = HondaExperiment(cfg, modalities=modalities,
                          event_budget=event_budget, result_dir=result_dir,
                          limit_label_num=False)
    core = build_encoder(cfg.network, num_seg=cfg.num_seg,
                         emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                         n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C,
                         keep_prob=cfg.keep_prob)
    sensors_enc = RTSN(n_seg=cfg.num_seg, emb_dim=SENSORS_EMB_DIM,
                       n_input=exp.val_extra[0].shape[-1],
                       keep_prob=cfg.keep_prob)
    sensors_pddm = PDDM(n_input=SENSORS_EMB_DIM)

    x0 = jnp.asarray(np.zeros((2,) + exp.val_feats.shape[1:], np.float32))
    s0 = jnp.asarray(np.zeros((2,) + exp.val_extra[0].shape[1:], np.float32))
    e32 = jnp.zeros((2, SENSORS_EMB_DIM), jnp.float32)
    params = {
        "modality_core": core.init(exp.next_key(), x0)["params"],
        "modality_sensors": {
            "encoder": sensors_enc.init(exp.next_key(), s0)["params"],
            "pddm": sensors_pddm.init(exp.next_key(), e32, e32,
                                      method="score")["params"],
        },
    }
    if cfg.sensors_path:
        ckpt = load_pytree(cfg.sensors_path, None)
        params["modality_sensors"] = _graft(
            params["modality_sensors"], ckpt.get("params", ckpt))

    frozen = ("modality_sensors",) if cfg.no_joint else ()
    state = TrainState.create(params, build_optimizer(
        cfg.optimizer, cfg.learning_rate, frozen_scopes=frozen))

    embed_fn = make_embed_fn(core, cfg.normalized)
    tri_cap = cfg.triplet_per_batch * 2
    uni_step, mm_step = make_weak_steps(core, sensors_enc, sensors_pddm,
                                        cfg, tri_cap)

    @jax.jit
    def sensors_sim(params, eve_sensors):
        import functools

        from multimodal_similarity_tpu.models import score_all_pairs_sym
        es = sensors_enc.apply(
            {"params": params["modality_sensors"]["encoder"]}, eve_sensors)
        return score_all_pairs_sym(functools.partial(
            sensors_pddm.apply,
            {"params": params["modality_sensors"]["pddm"]}, method="score"),
            es, block=min(128, es.shape[0]))

    def core_embed(params, feats):
        from multimodal_similarity_tpu.train.steps import embed_in_chunks
        return embed_in_chunks(lambda p, x: embed_fn(p, x),
                               params["modality_core"], feats,
                               beat=exp.beat_fn)

    metrics = {}
    # config-seeded host-miner streams (independent of global RNG state)
    mine_rng = random.Random(cfg.seed)
    mul_rng = np.random.RandomState(cfg.seed)
    epoch = epoch_of_step(int(state.step), exp.batch_per_epoch)
    # exp.close() must run even when the loop raises: it
    # restores the SIGTERM guard and flushes logs/traces
    try:
        while epoch < cfg.max_epochs:
            lr = learning_rate_schedule(epoch, cfg.learning_rate,
                                        cfg.static_epochs, cfg.max_epochs)
            steps_this_epoch = 0
            for batch in exp.loader.epoch():
                n = int(batch["num_events"])
                labels = batch["labels"][:n]
                sessions = batch["sessions"][:n]
                labeled_mask = np.asarray(
                    [s in exp.labeled_sessions for s in sessions])

                # labeled slice: facenet triplets -> unimodal op
                lab_idx_map = np.where(labeled_mask)[0]
                did_step = False
                if lab_idx_map.size:
                    emb = core_embed(state.params,
                                     batch["events"][:n][lab_idx_map])
                    dists = cdist(all_diffs(emb, emb), cfg.metric)
                    idx, _ = select_triplets_facenet(
                        labels[lab_idx_map], np.asarray(dists),
                        cfg.triplet_per_batch, cfg.alpha, cfg.num_negative,
                        rng=mine_rng)
                    if idx:
                        gather, mask = _pad_flat(
                            lab_idx_map[np.asarray(idx, np.int64)].tolist(),
                            tri_cap)
                        state, aux = uni_step(
                            state, jnp.asarray(batch["events"][:n][gather]),
                            jnp.asarray(mask), exp.next_key(), jnp.float32(lr))
                        did_step = True

                # unlabeled slice: PDDM pseudo-label triplets -> multimodal op
                if epoch >= cfg.multimodal_epochs:
                    sim = np.array(sensors_sim(
                        state.params, jnp.asarray(batch["events2"])))[:n, :n]
                    np.fill_diagonal(sim, np.nan)
                    if cfg.multimodal_select == "confidence":
                        mul_idx, count = select_triplets_multimodal(
                            sim, 0.9, cfg.triplet_per_batch, rng=mul_rng)
                    elif cfg.multimodal_select == "random":
                        mul_idx, count = random_triplets_multimodal(
                            sim, cfg.triplet_per_batch, rng=mul_rng)
                    elif cfg.multimodal_select == "nopos":
                        mul_idx, count = nopos_triplets_multimodal(
                            sim, cfg.triplet_per_batch, rng=mul_rng)
                    else:
                        raise NotImplementedError(cfg.multimodal_select)
                    if count:
                        gather, mask = _pad_flat(mul_idx, tri_cap)
                        state, aux = mm_step(
                            state, jnp.asarray(batch["events"][:n][gather]),
                            jnp.asarray(batch["events2"][:n][gather]),
                            jnp.asarray(mask), exp.next_key(), jnp.float32(lr))
                        did_step = True

                steps_this_epoch += did_step
                if did_step:
                    exp.log(int(state.step),
                            {"loss": float(aux["loss"]), "learning_rate": lr},
                            f"[{cfg.name}] epoch {epoch + 1} "
                            f"step {int(state.step)} "
                            f"loss {float(aux['loss']):.4f}")
                if exp._guard.should_stop:
                    break
            if exp.preempted(state):
                break

            if steps_this_epoch == 0:
                # no labeled sessions and pseudo-labels not yet active: the
                # global step cannot advance, so bail instead of spinning
                print(f"[{cfg.name}] epoch {epoch + 1}: no trainable slice "
                      "this epoch; stopping")
                break
            from multimodal_similarity_tpu.eval.metrics import (
                retrieval_metrics_device)
            val_emb = core_embed(state.params, cached_device(exp.val_feats))
            mAP, mPrec, recalls = retrieval_metrics_device(
                val_emb, exp.val_labels.reshape(-1))
            metrics = {"val_mAP": mAP, "val_mPrec": mPrec,
                       "val_recall@1": recalls[1]}
            exp.log(int(state.step), metrics,
                    f"[{cfg.name}] epoch {epoch + 1} val mAP {mAP:.4f}")
            exp.ckpt.save(state, int(state.step))
            epoch = epoch_of_step(int(state.step), exp.batch_per_epoch)

    finally:
        exp.close()
    return state, metrics, exp.result_dir


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
