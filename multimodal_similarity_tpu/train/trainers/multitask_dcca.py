"""Triplet + Deep-CCA multitask trainer.

Reference: src/multitask_dcca.py:25-380 — facenet triplets on the labeled
slice drive the triplet loss; a random unsupervised slice drives DCCA
correlation losses video<->sensors and video<->segment computed on frozen
pretrained RTSN towers (loss :130-138); only the core branch trains
(:141-144).  The staged lambda (0 before multimodal_epochs) replaces the
reference's two feed paths.
"""

from __future__ import annotations

import random
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.models import RTSN, build_encoder
from multimodal_similarity_tpu.ops.distances import all_diffs, cdist
from multimodal_similarity_tpu.ops.losses import dcca_loss, triplet_loss_masked
from multimodal_similarity_tpu.ops.mining import select_triplets_facenet
from multimodal_similarity_tpu.train.checkpoints import load_pytree
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, l2_regularization, learning_rate_schedule)
from multimodal_similarity_tpu.train.steps import (
    jit_step, l2_normalize, make_embed_fn)
from multimodal_similarity_tpu.train.trainer import (
    cached_device, epoch_of_step)
from multimodal_similarity_tpu.train.trainers._honda import HondaExperiment
from multimodal_similarity_tpu.train.trainers.multimodal_model import _graft

SENSORS_EMB_DIM = 32
SEGMENT_EMB_DIM = 32


def train(cfg: TrainConfig, use_mse: bool = False,
          event_budget: Optional[int] = None,
          result_dir: Optional[str] = None):
    """use_mse=True gives the cross-prediction variant
    (multitask_cross_prediction.py:25-390): OutputLayer heads regress the
    (frozen) sensors/segment embeddings from the core embedding with MSE.
    NOTE the reference's segment MSE compares against embedding_sensors
    (:142) — a bug; the intended target (embedding_segment) is used here,
    per SURVEY.md §7 'reproduce behaviors, not bugs'."""
    modalities = cfg.feat if isinstance(cfg.feat, list) and \
        len(cfg.feat) == 3 else ["resnet", "sensors", "segment"]
    exp = HondaExperiment(cfg, modalities=modalities,
                          event_budget=event_budget, result_dir=result_dir,
                          limit_label_num=False)

    core = build_encoder(cfg.network, num_seg=cfg.num_seg,
                         emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                         n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C,
                         keep_prob=cfg.keep_prob)
    sensors_enc = RTSN(n_seg=cfg.num_seg, emb_dim=SENSORS_EMB_DIM,
                       n_input=exp.val_extra[0].shape[-1])
    seg_dim = exp.val_extra[1].shape[-1]
    segment_enc = RTSN(n_seg=cfg.num_seg, emb_dim=SEGMENT_EMB_DIM,
                       n_input=seg_dim)

    x0 = jnp.asarray(np.zeros((2,) + exp.val_feats.shape[1:], np.float32))
    s0 = jnp.asarray(np.zeros((2,) + exp.val_extra[0].shape[1:], np.float32))
    g0 = jnp.asarray(np.zeros((2,) + exp.val_extra[1].shape[1:], np.float32))
    params = {
        "modality_core": core.init(exp.next_key(), x0)["params"],
        "modality_sensors": sensors_enc.init(exp.next_key(), s0)["params"],
        "modality_segment": segment_enc.init(exp.next_key(), g0)["params"],
    }
    heads = {}
    if use_mse:
        from multimodal_similarity_tpu.models import OutputLayer
        heads["sensors"] = OutputLayer(n_output=SENSORS_EMB_DIM,
                                       keep_prob=cfg.keep_prob)
        heads["segment"] = OutputLayer(n_output=SEGMENT_EMB_DIM,
                                       keep_prob=cfg.keep_prob)
        e0 = jnp.zeros((2, cfg.emb_dim), jnp.float32)
        params["modality_core_heads"] = {
            "sensors": heads["sensors"].init(exp.next_key(), e0)["params"],
            "segment": heads["segment"].init(exp.next_key(), e0)["params"],
        }

    for scope, path in (("modality_sensors", cfg.sensors_path),
                        ("modality_segment", cfg.segment_path)):
        if path:
            ckpt = load_pytree(path, None)
            branch = ckpt.get("params", ckpt)
            if "encoder" in branch:
                branch = branch["encoder"]
            params[scope] = _graft(params[scope], branch)

    # only the core branch trains (reference :141-144)
    frozen = ("modality_sensors", "modality_segment")
    state = TrainState.create(params, build_optimizer(
        cfg.optimizer, cfg.learning_rate, frozen_scopes=frozen))

    tri_cap = cfg.triplet_per_batch * 2
    unsup_cap = min(3 * cfg.triplet_per_batch, event_budget or
                    cfg.event_per_batch)
    embed_fn = make_embed_fn(core, cfg.normalized)

    def step_builder():
        def step(state, tri_events, tri_mask, unsup_events, unsup_sensors,
                 unsup_segment, lambda_mul, key, learning_rate):
            k_drop, k_head = jax.random.split(key)

            def loss_fn(params):
                emb_tri = core.apply({"params": params["modality_core"]},
                                     tri_events, train=True,
                                     rngs={"dropout": k_drop})
                if cfg.normalized:
                    emb_tri = l2_normalize(emb_tri)
                tri = emb_tri.reshape(tri_cap, 3, -1)
                metric_loss = triplet_loss_masked(
                    tri[:, 0], tri[:, 1], tri[:, 2], tri_mask, cfg.alpha)

                emb_u = core.apply({"params": params["modality_core"]},
                                   unsup_events, train=True,
                                   rngs={"dropout": k_drop})
                emb_s = sensors_enc.apply(
                    {"params": params["modality_sensors"]}, unsup_sensors)
                emb_g = segment_enc.apply(
                    {"params": params["modality_segment"]}, unsup_segment)
                if cfg.normalized:
                    emb_u = l2_normalize(emb_u)
                    emb_s = l2_normalize(emb_s)
                    emb_g = l2_normalize(emb_g)

                if use_mse:
                    h_s = heads["sensors"].apply(
                        {"params": params["modality_core_heads"]["sensors"]},
                        jax.nn.relu(emb_u), train=True,
                        rngs={"dropout": k_head})
                    h_g = heads["segment"].apply(
                        {"params": params["modality_core_heads"]["segment"]},
                        jax.nn.relu(emb_u), train=True,
                        rngs={"dropout": k_head})
                    mul_loss = (jnp.mean(jnp.square(emb_s - h_s))
                                / SENSORS_EMB_DIM
                                + jnp.mean(jnp.square(emb_g - h_g))
                                / SEGMENT_EMB_DIM)
                else:
                    mul_loss = (dcca_loss(emb_u, emb_s)
                                + dcca_loss(emb_u, emb_g))

                total = metric_loss + mul_loss * lambda_mul
                if cfg.lambda_l2:
                    total = total + cfg.lambda_l2 * l2_regularization(params)
                return total, {"loss": total, "metric_loss": metric_loss,
                               "mul_loss": mul_loss}

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            return (state.apply_gradients(grads,
                                          learning_rate=learning_rate), aux)

        return jit_step(step)

    step_fn = step_builder()

    def core_embed(params, feats):
        from multimodal_similarity_tpu.train.steps import embed_in_chunks
        return embed_in_chunks(lambda p, x: embed_fn(p, x),
                               params["modality_core"], feats,
                               beat=exp.beat_fn)

    metrics = {}
    # config-seeded host-side streams (miner + unsup slice), independent
    # of process-global RNG state
    mine_rng = random.Random(cfg.seed)
    unsup_rng = np.random.RandomState(cfg.seed)
    epoch = epoch_of_step(int(state.step), exp.batch_per_epoch)
    # exp.close() must run even when the loop raises: it
    # restores the SIGTERM guard and flushes logs/traces
    try:
        while epoch < cfg.max_epochs:
            lr = learning_rate_schedule(epoch, cfg.learning_rate,
                                        cfg.static_epochs, cfg.max_epochs,
                                        decay_base=0.01)
            lambda_mul = cfg.lambda_multimodal if epoch >= cfg.multimodal_epochs \
                else 0.0
            step_at_epoch_start = int(state.step)
            for batch in exp.loader.epoch():
                n = int(batch["num_events"])
                labels = batch["labels"][:n]
                sessions = batch["sessions"][:n]
                labeled = np.asarray(
                    [s in exp.labeled_sessions for s in sessions])
                lab_map = np.where(labeled)[0]

                gather = np.zeros(3 * tri_cap, np.int32)
                tri_mask = np.zeros(tri_cap, np.float32)
                if lab_map.size:
                    emb = core_embed(state.params, batch["events"][:n][lab_map])
                    dists = cdist(all_diffs(emb, emb), cfg.metric)
                    idx, _ = select_triplets_facenet(
                        labels[lab_map], np.asarray(dists),
                        cfg.triplet_per_batch, cfg.alpha, cfg.num_negative,
                        rng=mine_rng)
                    t = min(len(idx) // 3, tri_cap)
                    if t:
                        gather[: 3 * t] = lab_map[
                            np.asarray(idx[: 3 * t], np.int64)]
                        tri_mask[:t] = 1.0
                if not tri_mask.any() and lambda_mul == 0.0:
                    continue  # nothing to train this step (reference :312-314)

                # fixed-size unsupervised slice; resample with replacement if
                # the batch is short (padding zeros would corrupt the DCCA
                # covariances)
                perm = unsup_rng.permutation(n)[:unsup_cap]
                if perm.size < unsup_cap:
                    extra = unsup_rng.randint(0, n, size=unsup_cap - perm.size)
                    perm = np.concatenate([perm, extra])
                u_idx = perm.astype(np.int32)

                state, aux = step_fn(
                    state, jnp.asarray(batch["events"][:n][gather]),
                    jnp.asarray(tri_mask),
                    jnp.asarray(batch["events"][:n][u_idx]),
                    jnp.asarray(batch["events2"][:n][u_idx]),
                    jnp.asarray(batch["events3"][:n][u_idx]),
                    jnp.float32(lambda_mul),
                    exp.next_key(), jnp.float32(lr))
                exp.log(int(state.step),
                        {**{k: float(v) for k, v in aux.items()},
                         "learning_rate": lr},
                        f"[{cfg.name}] epoch {epoch + 1} step {int(state.step)} "
                        f"loss {float(aux['loss']):.4f}")
                if exp._guard.should_stop:
                    break
            if exp.preempted(state):
                break

            from multimodal_similarity_tpu.eval.metrics import (
                retrieval_metrics_device)
            if int(state.step) == step_at_epoch_start:
                print(f"[{cfg.name}] epoch {epoch + 1}: no trainable batch; stopping")
                break
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
