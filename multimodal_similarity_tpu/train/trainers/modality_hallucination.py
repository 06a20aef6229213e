"""Modality-hallucination trainer (Learning with Side Information).

Reference: src/modality_hallucination.py:27-376 — hallucination branches
map video features to the sensors/segment embedding spaces (:83-116); loss
is the sum of six triplet losses (core, sensors, hal_sensors, segment,
hal_segment, fused concat embedding) plus an l2 match between each real
and hallucinated embedding weighted by lambda_multimodal (:156-173).  The
``weak`` variant trains sensors-only with staged lambda placeholders
(modality_hallucination_weak.py:142-144), expressed here as the
``sensors_only`` flag with lambda_metric/lambda_hal multipliers.
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
from multimodal_similarity_tpu.ops.losses import triplet_loss_masked
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


def train(cfg: TrainConfig, sensors_only: bool = False,
          lambda_metric: float = 1.0, lambda_hal: float = 1.0,
          event_budget: Optional[int] = None,
          result_dir: Optional[str] = None):
    modalities = ["resnet", "sensors"] if sensors_only else \
        ["resnet", "sensors", "segment"]
    exp = HondaExperiment(cfg, modalities=modalities,
                          event_budget=event_budget, result_dir=result_dir)

    core = build_encoder(cfg.network, num_seg=cfg.num_seg,
                         emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                         n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C,
                         keep_prob=cfg.keep_prob)
    sensors_enc = RTSN(n_seg=cfg.num_seg, emb_dim=SENSORS_EMB_DIM,
                       n_input=exp.val_extra[0].shape[-1],
                       keep_prob=cfg.keep_prob)
    hal_sensors = build_encoder(cfg.network, num_seg=cfg.num_seg,
                                emb_dim=SENSORS_EMB_DIM, n_input=cfg.n_input,
                                n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C,
                                keep_prob=cfg.keep_prob)
    if not sensors_only:
        seg_dim = exp.val_extra[1].shape[-1]
        segment_enc = RTSN(n_seg=cfg.num_seg, emb_dim=SEGMENT_EMB_DIM,
                           n_input=seg_dim, keep_prob=cfg.keep_prob)
        hal_segment = build_encoder(cfg.network, num_seg=cfg.num_seg,
                                    emb_dim=SEGMENT_EMB_DIM,
                                    n_input=cfg.n_input, n_h=cfg.n_h,
                                    n_w=cfg.n_w, n_C=cfg.n_C,
                                    keep_prob=cfg.keep_prob)

    x0 = jnp.asarray(np.zeros((2,) + exp.val_feats.shape[1:], np.float32))
    s0 = jnp.asarray(np.zeros((2,) + exp.val_extra[0].shape[1:], np.float32))
    params = {
        "modality_core": core.init(exp.next_key(), x0)["params"],
        "modality_sensors": sensors_enc.init(exp.next_key(), s0)["params"],
        "hallucination_sensors": hal_sensors.init(exp.next_key(),
                                                  x0)["params"],
    }
    if not sensors_only:
        g0 = jnp.asarray(np.zeros((2,) + exp.val_extra[1].shape[1:],
                                  np.float32))
        params["modality_segment"] = segment_enc.init(exp.next_key(),
                                                      g0)["params"]
        params["hallucination_segment"] = hal_segment.init(exp.next_key(),
                                                           x0)["params"]

    for scope, path, template_key in (
            ("modality_sensors", cfg.sensors_path, "encoder"),
            ("modality_segment", cfg.segment_path, "encoder")):
        if path and scope in params:
            ckpt = load_pytree(path, None)
            branch = ckpt.get("params", ckpt)
            # pddm_model ckpts nest the encoder under 'encoder'
            if template_key in branch:
                branch = branch[template_key]
            params[scope] = _graft(params[scope], branch)

    state = TrainState.create(params, build_optimizer(cfg.optimizer,
                                                      cfg.learning_rate))

    tri_cap = cfg.triplet_per_batch * 2
    embed_fn = make_embed_fn(core, cfg.normalized)

    def step_builder():
        def step(state, tri_events, tri_sensors, tri_segment, mask, key,
                 learning_rate):
            keys = jax.random.split(key, 5)

            def branch_emb(model, p, x, k):
                e = model.apply({"params": p}, x, train=True,
                                rngs={"dropout": k})
                return l2_normalize(e) if cfg.normalized else e

            def tri_split(e):
                t = e.reshape(tri_cap, 3, -1)
                return t[:, 0], t[:, 1], t[:, 2]

            def loss_fn(params):
                emb = branch_emb(core, params["modality_core"], tri_events,
                                 keys[0])
                emb_s = branch_emb(sensors_enc, params["modality_sensors"],
                                   tri_sensors, keys[1])
                emb_hs = branch_emb(hal_sensors,
                                    params["hallucination_sensors"],
                                    tri_events, keys[2])
                a, p, n = tri_split(emb)
                a_s, p_s, n_s = tri_split(emb_s)
                a_hs, p_hs, n_hs = tri_split(emb_hs)

                metric = (triplet_loss_masked(a, p, n, mask, cfg.alpha)
                          + triplet_loss_masked(a_s, p_s, n_s, mask,
                                                cfg.alpha)
                          + triplet_loss_masked(a_hs, p_hs, n_hs, mask,
                                                cfg.alpha))
                hal = 0.5 * jnp.sum(
                    jnp.square(emb_s - emb_hs)
                    * mask.repeat(3)[:, None])

                if not sensors_only:
                    emb_g = branch_emb(segment_enc,
                                       params["modality_segment"],
                                       tri_segment, keys[3])
                    emb_hg = branch_emb(hal_segment,
                                        params["hallucination_segment"],
                                        tri_events, keys[4])
                    a_g, p_g, n_g = tri_split(emb_g)
                    a_hg, p_hg, n_hg = tri_split(emb_hg)
                    # fused concat embedding (reference :151-154; the p/n
                    # fused parts reuse the anchor hal-segment slice there —
                    # intended semantics uses per-role slices, SURVEY.md §7)
                    a_f = jnp.concatenate([a, a_hs, a_hg], axis=1)
                    p_f = jnp.concatenate([p, p_hs, p_hg], axis=1)
                    n_f = jnp.concatenate([n, n_hs, n_hg], axis=1)
                    metric = (metric
                              + triplet_loss_masked(a_g, p_g, n_g, mask,
                                                    cfg.alpha)
                              + triplet_loss_masked(a_hg, p_hg, n_hg, mask,
                                                    cfg.alpha)
                              + triplet_loss_masked(a_f, p_f, n_f, mask,
                                                    cfg.alpha))
                    hal = hal + 0.5 * jnp.sum(
                        jnp.square(emb_g - emb_hg)
                        * mask.repeat(3)[:, None])
                else:
                    a_f = jnp.concatenate([a, a_hs], axis=1)
                    p_f = jnp.concatenate([p, p_hs], axis=1)
                    n_f = jnp.concatenate([n, n_hs], axis=1)
                    metric = metric + triplet_loss_masked(a_f, p_f, n_f,
                                                          mask, cfg.alpha)

                total = (lambda_metric * metric
                         + lambda_hal * cfg.lambda_multimodal * hal)
                if cfg.lambda_l2:
                    total = total + cfg.lambda_l2 * l2_regularization(params)
                return total, {"loss": total, "metric_loss": metric,
                               "hal_loss": hal}

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            return (state.apply_gradients(grads, learning_rate=learning_rate),
                    aux)

        return jit_step(step)

    step_fn = step_builder()

    def core_embed(params, feats):
        from multimodal_similarity_tpu.train.steps import embed_in_chunks
        return embed_in_chunks(lambda p, x: embed_fn(p, x),
                               params["modality_core"], feats,
                               beat=exp.beat_fn)

    metrics = {}
    # config-seeded host-miner stream (independent of global RNG)
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
                emb = core_embed(state.params, batch["events"][:n])
                dists = cdist(all_diffs(emb, emb), cfg.metric)
                idx, _ = select_triplets_facenet(
                    batch["labels"][:n], np.asarray(dists),
                    cfg.triplet_per_batch, cfg.alpha, cfg.num_negative,
                    rng=mine_rng)
                if not idx:
                    continue
                t = min(len(idx) // 3, tri_cap)
                gather = np.zeros(3 * tri_cap, np.int32)
                gather[: 3 * t] = np.asarray(idx[: 3 * t], np.int32)
                mask = np.zeros(tri_cap, np.float32)
                mask[:t] = 1.0
                # triplets arrive role-major for the reshape(tri_cap, 3, ...)
                gmat = gather.reshape(tri_cap, 3)
                tri_events = jnp.asarray(batch["events"][:n][gmat.reshape(-1)])
                tri_sensors = jnp.asarray(batch["events2"][:n][gmat.reshape(-1)])
                tri_segment = (jnp.asarray(
                    batch["events3"][:n][gmat.reshape(-1)])
                    if not sensors_only else tri_sensors)
                state, aux = step_fn(state, tri_events, tri_sensors, tri_segment,
                                     jnp.asarray(mask), exp.next_key(),
                                     jnp.float32(lr))
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
