"""Triplet + verification multitask trainer.

Reference: src/multitask_model.py:105-349 — FaceNet-mined triplets drive
both the triplet loss and a PairSim2 verification head: (anchor, positive)
pairs labeled 1, (anchor, negative) pairs labeled 0, cross-entropy weighted
by lambda_ver (verification loss at reference :174-186).  The whole thing
is one fused jitted step here.
"""

from __future__ import annotations

import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.models import PairSim2, build_encoder
from multimodal_similarity_tpu.ops.losses import triplet_loss_masked
from multimodal_similarity_tpu.ops.mining import mine_semihard_triplets
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, l2_regularization, learning_rate_schedule)
from multimodal_similarity_tpu.train.steps import (
    dequant_features, jit_step,
    l2_normalize, make_embed_fn, masked_self_distance, take_features)
from multimodal_similarity_tpu.train.trainer import epoch_of_step, validate
from multimodal_similarity_tpu.train.trainers._honda import HondaExperiment


def make_multitask_step(encoder, ver_head, cfg: TrainConfig, jit: bool = True):
    """``jit=False`` returns the raw body for the fused device-cache path
    (train/cached_steps.make_cached_body_step); the body is
    feed-polymorphic — ``events`` may be a dense array or the int8 feed's
    {"q", "scale"} dict (dequant_features/take_features pass dense
    through)."""
    def step(state, events, labels, mask, key, learning_rate):
        k_mine, k_drop, k_ver = jax.random.split(key, 3)

        def loss_fn(params):
            emb_mine = encoder.apply({"params": params["encoder"]},
                                     dequant_features(events))
            if cfg.normalized:
                emb_mine = l2_normalize(emb_mine)
            emb_mine = jax.lax.stop_gradient(emb_mine)
            dists = masked_self_distance(emb_mine, mask, cfg.metric)
            mined = mine_semihard_triplets(
                dists, labels, k_mine, cfg.triplet_per_batch,
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

            # verification: (a, p) -> 1, (a, n) -> 0 on the same triplets
            pair_a = jnp.concatenate([a, a], axis=0)
            pair_b = jnp.concatenate([p, n], axis=0)
            pair_lab = jnp.concatenate(
                [jnp.ones(t, jnp.int32), jnp.zeros(t, jnp.int32)])
            pair_mask = jnp.concatenate([mined.mask, mined.mask])
            logits, _ = ver_head.apply(
                {"params": params["ver"]}, pair_a, pair_b, True,
                method="score", rngs={"dropout": k_ver})
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(log_probs, pair_lab[:, None], -1)[:, 0]
            denom = jnp.maximum(jnp.sum(pair_mask), 1.0)
            ver_loss = jnp.sum(nll * pair_mask) / denom
            pred = jnp.argmax(logits, -1)
            ver_acc = jnp.sum((pred == pair_lab) * pair_mask) / denom

            total = metric_loss + cfg.lambda_ver * ver_loss
            if cfg.lambda_l2:
                total = total + cfg.lambda_l2 * l2_regularization(params)
            return total, {"loss": total, "metric_loss": metric_loss,
                           "ver_loss": ver_loss, "ver_acc": ver_acc,
                           "active_count": mined.active_count,
                           "triplet_num": jnp.sum(mined.mask)}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, learning_rate=learning_rate)
        return state, aux

    return jit_step(step) if jit else step


def train(cfg: TrainConfig, event_budget: Optional[int] = None,
          result_dir: Optional[str] = None):
    exp = HondaExperiment(cfg, event_budget=event_budget,
                          result_dir=result_dir)
    encoder = build_encoder(cfg.network, num_seg=cfg.num_seg,
                            emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                            n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C,
                            keep_prob=cfg.keep_prob)
    ver_head = PairSim2(n_input=cfg.emb_dim, keep_prob=cfg.keep_prob)

    x0 = jnp.asarray(np.zeros((2,) + exp.val_feats.shape[1:], np.float32))
    enc_vars = encoder.init(exp.next_key(), x0)
    e0 = jnp.zeros((2, cfg.emb_dim), jnp.float32)
    ver_vars = ver_head.init(exp.next_key(), e0, e0, method="score")
    params = {"encoder": enc_vars["params"], "ver": ver_vars["params"]}
    state = TrainState.create(params, build_optimizer(cfg.optimizer,
                                                      cfg.learning_rate))

    embed_fn = make_embed_fn(encoder, cfg.normalized)
    step_fn = make_multitask_step(encoder, ver_head, cfg)

    # --device_cache: the train set lives in HBM as int8; epochs gather
    # fresh TSN segments on device and the link carries only index plans
    cache = exp.build_cache()
    if cache is not None:
        raw = make_multitask_step(encoder, ver_head, cfg, jit=False)
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
                        f"loss {sc['loss']:.4f} "
                        f"ver_acc {sc['ver_acc']:.3f}"))
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
                            f"loss {float(aux['loss']):.4f} "
                            f"ver_acc {float(aux['ver_acc']):.3f}")
                    if exp._guard.should_stop:
                        break
                step_host = int(state.step)
            if exp.preempted(state):
                break
            if step_host == step_at_epoch_start:
                print(f"[{cfg.name}] epoch {epoch + 1}: no trainable batch; stopping")
                break
            metrics, _ = validate(
                lambda p, x: embed_fn(p["encoder"], x) if isinstance(p, dict)
                else embed_fn(p, x),
                state.params, exp.val_feats, exp.val_labels,
                beat=exp.beat_fn)
            exp.log(step_host, metrics,
                    f"[{cfg.name}] epoch {epoch + 1} val mAP "
                    f"{metrics['val_mAP']:.4f}")
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
