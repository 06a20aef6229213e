"""PDDM similarity-net trainer.

Reference: src/pddm_model.py:87-347 — joint objective: PDDM margin loss
mean(max(pddm_ap - pddm_an + 0.6, 0)) on prob[:, 0] (dissimilar
probability) plus 0.5x triplet loss; mining runs FaceNet-style but on the
all-pairs PDDM dissimilarity matrix instead of embedding distance
(reference :270); validation adds the PDDM-ranking mAP (mAP_PDDM,
reference :322-331).  The O(N^2) pairwise scoring loop becomes the
blockwise on-device ``score_all_pairs_sym`` pass (PDDM is
swap-symmetric, so only the upper-triangle tile pairs are scored).
"""

from __future__ import annotations

import functools
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.eval.metrics import average_precision
from multimodal_similarity_tpu.models import (
    PDDM, build_encoder, score_all_pairs_sym)
from multimodal_similarity_tpu.ops.losses import triplet_loss_masked
from multimodal_similarity_tpu.ops.mining import mine_semihard_triplets
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, l2_regularization, learning_rate_schedule)
from multimodal_similarity_tpu.train.steps import (
    dequant_features, jit_step, l2_normalize, make_embed_fn, take_features)
from multimodal_similarity_tpu.train.trainer import (
    cached_device, epoch_of_step, validate)
from multimodal_similarity_tpu.train.trainers._honda import HondaExperiment

_PAD = 1e30


def make_pddm_step(encoder, head, cfg: TrainConfig, jit: bool = True):
    """Fused: embed -> all-pairs PDDM dissim matrix -> semi-hard mining on
    it -> re-forward -> pddm margin loss + 0.5 triplet.

    ``jit=False`` returns the raw body for the fused device-cache path;
    ``events`` may be dense or the int8 feed's {"q", "scale"} dict."""

    def step(state, events, labels, mask, key, learning_rate):
        k_mine, k_drop = jax.random.split(key)

        def dissim_matrix(params, emb):
            score_fn = functools.partial(
                head.apply, {"params": params["pddm"]}, method="score")
            sim = score_all_pairs_sym(
                lambda a, b: score_fn(a, b), emb,
                block=min(128, emb.shape[0]))
            return 1.0 - sim  # prob[:, 0] = dissimilar = 1 - prob[:, 1]

        def loss_fn(params):
            emb_mine = encoder.apply({"params": params["encoder"]},
                                     dequant_features(events))
            if cfg.normalized:
                emb_mine = l2_normalize(emb_mine)
            emb_mine = jax.lax.stop_gradient(emb_mine)
            dmat = jax.lax.stop_gradient(
                dissim_matrix(params, emb_mine))
            invalid = 1.0 - mask
            dmat = dmat + invalid[None, :] * _PAD + invalid[:, None] * _PAD
            mined = mine_semihard_triplets(
                dmat, labels, k_mine, cfg.triplet_per_batch,
                alpha=cfg.alpha, num_negative=cfg.num_negative, valid=mask)

            tri_idx = jnp.concatenate(
                [mined.anchor, mined.positive, mined.negative])
            tri_emb = encoder.apply(
                {"params": params["encoder"]},
                dequant_features(take_features(events, tri_idx)),
                train=True, rngs={"dropout": k_drop})
            if cfg.normalized:
                tri_emb = l2_normalize(tri_emb)
            t = mined.anchor.shape[0]
            a, p, n = tri_emb[:t], tri_emb[t:2 * t], tri_emb[2 * t:]
            metric_loss = triplet_loss_masked(a, p, n, mined.mask, cfg.alpha)

            _, prob_ap = head.apply({"params": params["pddm"]}, a, p,
                                    method="score")
            _, prob_an = head.apply({"params": params["pddm"]}, a, n,
                                    method="score")
            hinge = jnp.maximum(prob_ap[:, 0] - prob_an[:, 0] + 0.6, 0.0)
            denom = jnp.maximum(jnp.sum(mined.mask), 1.0)
            pddm_loss = jnp.sum(hinge * mined.mask) / denom

            total = pddm_loss + 0.5 * metric_loss
            if cfg.lambda_l2:
                total = total + cfg.lambda_l2 * l2_regularization(params)
            return total, {"loss": total, "pddm_loss": pddm_loss,
                           "metric_loss": metric_loss,
                           "active_count": mined.active_count,
                           "triplet_num": jnp.sum(mined.mask)}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, learning_rate=learning_rate)
        return state, aux

    return jit_step(step) if jit else step


def pddm_similarity_matrix(encoder, head, params, feats, normalized=True,
                           block: int = 128) -> np.ndarray:
    """All-pairs PDDM similarity probabilities for a feature set."""
    emb = encoder.apply({"params": params["encoder"]}, jnp.asarray(feats))
    if normalized:
        emb = l2_normalize(emb)
    score_fn = functools.partial(head.apply, {"params": params["pddm"]},
                                 method="score")
    return np.asarray(score_all_pairs_sym(lambda a, b: score_fn(a, b), emb,
                                      block=min(block, emb.shape[0])))


def mAP_PDDM(sim: np.ndarray, labels: np.ndarray) -> float:
    """PDDM-ranking mAP (reference :322-331): score = 1 - dissim = sim."""
    labels = labels.reshape(-1)
    total, count = 0.0, 0
    for i in range(labels.shape[0]):
        if labels[i] > 0:
            temp_labels = np.delete(labels, i)
            temp = np.delete(sim[i], i)
            ap = average_precision(temp_labels == labels[i], temp)
            if not np.isnan(ap):
                total += ap
                count += 1
    return total / max(count, 1)


def train(cfg: TrainConfig, event_budget: Optional[int] = None,
          result_dir: Optional[str] = None):
    exp = HondaExperiment(cfg, event_budget=event_budget,
                          result_dir=result_dir)
    encoder = build_encoder(cfg.network, num_seg=cfg.num_seg,
                            emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                            n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C,
                            keep_prob=cfg.keep_prob)
    head = PDDM(n_input=cfg.emb_dim)

    x0 = jnp.asarray(np.zeros((2,) + exp.val_feats.shape[1:], np.float32))
    enc_vars = encoder.init(exp.next_key(), x0)
    e0 = jnp.zeros((2, cfg.emb_dim), jnp.float32)
    pddm_vars = head.init(exp.next_key(), e0, e0, method="score")
    state = TrainState.create(
        {"encoder": enc_vars["params"], "pddm": pddm_vars["params"]},
        build_optimizer(cfg.optimizer, cfg.learning_rate))
    if cfg.model_path:
        from multimodal_similarity_tpu.train.checkpoints import load_pytree
        state = load_pytree(cfg.model_path, state)

    embed_fn = make_embed_fn(encoder, cfg.normalized)
    step_fn = make_pddm_step(encoder, head, cfg)

    # --device_cache: the train set lives in HBM as int8; epochs gather
    # fresh TSN segments on device and the link carries only index plans
    cache = exp.build_cache()
    if cache is not None:
        raw = make_pddm_step(encoder, head, cfg, jit=False)
        fused, multi, cache_ops = exp.cached_programs(
            cache, lambda st, ev, lab, m, k, lr_: raw(st, ev[0], lab, m,
                                                      k, lr_))

    metrics = {}
    step_host = int(state.step)
    epoch = epoch_of_step(step_host, exp.batch_per_epoch)
    # exp.close() must run even when the loop raises: it
    # restores the SIGTERM guard and flushes logs/traces
    try:
        while epoch < cfg.max_epochs:
            lr = learning_rate_schedule(epoch, cfg.learning_rate,
                                        cfg.static_epochs, cfg.max_epochs)
            step_at_epoch_start = step_host
            if cache is not None:
                state, step_host, _ = exp.run_cached_epoch(
                    cache, state, fused=fused, multi=multi,
                    cache_ops=cache_ops, lr=lr, step_host=step_host,
                    epoch=epoch,
                    echo=lambda e, s, sc: (
                        f"[{cfg.name}] epoch {e + 1} step {s} "
                        f"loss {sc['loss']:.4f}"))
            else:
                for batch in exp.loader.epoch():
                    state, aux = step_fn(
                        state, jnp.asarray(batch["events"]),
                        jnp.asarray(batch["labels"]),
                        jnp.asarray(batch["mask"]),
                        exp.next_key(), jnp.float32(lr))
                    exp.log(int(state.step),
                            {**{k: float(v) for k, v in aux.items()},
                             "learning_rate": lr},
                            f"[{cfg.name}] epoch {epoch + 1} step "
                            f"{int(state.step)} "
                            f"loss {float(aux['loss']):.4f}")
                    if exp._guard.should_stop:
                        break
                step_host = int(state.step)
            if exp.preempted(state):
                break
            if step_host == step_at_epoch_start:
                print(f"[{cfg.name}] epoch {epoch + 1}: no trainable batch; stopping")
                break
            metrics, _ = validate(
                lambda p, x: embed_fn(p["encoder"], x),
                state.params, exp.val_feats, exp.val_labels,
                beat=exp.beat_fn)
            sim = pddm_similarity_matrix(encoder, head, state.params,
                                         cached_device(exp.val_feats),
                                         cfg.normalized)
            metrics["val_mAP_PDDM"] = mAP_PDDM(sim, exp.val_labels)
            exp.log(step_host, metrics,
                    f"[{cfg.name}] epoch {epoch + 1} "
                    f"val mAP {metrics['val_mAP']:.4f} "
                    f"mAP_PDDM {metrics['val_mAP_PDDM']:.4f}")
            exp.ckpt.save(state, step_host)
            epoch = epoch_of_step(step_host, exp.batch_per_epoch)

    finally:
        exp.close()
    return state, metrics, exp.result_dir


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
