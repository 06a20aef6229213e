"""Pure cross-modal regression: video embedding -> raw auxiliary features.

Reference: src/cross_prediction.py:26-236 — core encoder + OutputLayer
regressing mean-pooled raw next-modality features with MSE (:76-79), used
to produce cross-predicted embeddings for late fusion.
"""

from __future__ import annotations

import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.data import mean_pool_input
from multimodal_similarity_tpu.models import OutputLayer, build_encoder
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, l2_regularization, learning_rate_schedule)
from multimodal_similarity_tpu.train.steps import (
    dequant_features, jit_step, make_embed_fn)
from multimodal_similarity_tpu.train.trainer import epoch_of_step
from multimodal_similarity_tpu.train.trainers._honda import HondaExperiment


def train(cfg: TrainConfig, event_budget: Optional[int] = None,
          result_dir: Optional[str] = None):
    modalities = cfg.feat if isinstance(cfg.feat, list) else \
        ["resnet", "sensors"]
    exp = HondaExperiment(cfg, modalities=modalities,
                          event_budget=event_budget, result_dir=result_dir)
    # second modality target: mean-pooled raw features (reference uses
    # utils.mean_pool_input as the modality-2 prepare, :95)
    exp.loader.prepare_funcs[1] = mean_pool_input

    target_dim = int(np.prod(cfg.feat_dim.get(
        modalities[1], (8,))))
    core = build_encoder(cfg.network, num_seg=cfg.num_seg,
                         emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                         n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C,
                         keep_prob=cfg.keep_prob)
    head = OutputLayer(n_output=target_dim, keep_prob=cfg.keep_prob)

    x0 = jnp.asarray(np.zeros((2,) + exp.val_feats.shape[1:], np.float32))
    e0 = jnp.zeros((2, cfg.emb_dim), jnp.float32)
    params = {
        "encoder": core.init(exp.next_key(), x0)["params"],
        "head": head.init(exp.next_key(), e0)["params"],
    }
    state = TrainState.create(params, build_optimizer(cfg.optimizer,
                                                      cfg.learning_rate))

    def step_fn_builder(jit=True):
        def step(state, events, targets, mask, key, learning_rate):
            k_drop, k_head = jax.random.split(key)

            def loss_fn(params):
                # feed-polymorphic: dense f32 from the loader, or the int8
                # {"q", "scale"} dict from the device cache's fused gather
                hidden = core.apply({"params": params["encoder"]},
                                    dequant_features(events),
                                    train=True, rngs={"dropout": k_drop})
                logits = head.apply({"params": params["head"]},
                                    jax.nn.relu(hidden), train=True,
                                    rngs={"dropout": k_head})
                sq = jnp.mean(jnp.square(targets - logits), axis=1)
                denom = jnp.maximum(jnp.sum(mask), 1.0)
                mse = jnp.sum(sq * mask) / denom
                total = mse
                if cfg.lambda_l2:
                    total = total + cfg.lambda_l2 * l2_regularization(params)
                return total, {"loss": total, "mse": mse}

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            return (state.apply_gradients(grads,
                                          learning_rate=learning_rate), aux)

        return jit_step(step) if jit else step

    step_fn = step_fn_builder()
    embed_fn = make_embed_fn(core, True)

    # --device_cache: the modalities live in HBM as int8; the video
    # branch gathers fresh TSN segments per epoch while the regression
    # target mean-pools its whole window ON DEVICE (the device twin of
    # the mean_pool_input prepare above); any extra modalities (loaded
    # but unused by this trainer, matching the streamed path) ride tsn
    cache = exp.build_cache(
        modality_modes=("tsn", "meanpool") + ("tsn",) * (len(modalities) - 2))
    if cache is not None:
        raw = step_fn_builder(jit=False)
        fused, multi, cache_ops = exp.cached_programs(
            cache, lambda st, ev, lab, m, k, lr_: raw(
                st, ev[0], ev[1].reshape(ev[1].shape[0], -1), m, k, lr_))

    metrics = {}
    step_host = int(state.step)
    epoch = epoch_of_step(step_host, exp.batch_per_epoch)
    last_mse = float("nan")
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
                        f"mse {sc['mse']:.4f}"))
                if step_host > step_at_epoch_start:
                    last_mse = float(exp.last_cached_aux["mse"])
            else:
                for batch in exp.loader.epoch():
                    targets = batch["events2"].reshape(
                        batch["events2"].shape[0], -1)
                    state, aux = step_fn(
                        state, jnp.asarray(batch["events"]),
                        jnp.asarray(targets), jnp.asarray(batch["mask"]),
                        exp.next_key(), jnp.float32(lr))
                    exp.log(int(state.step),
                            {**{k: float(v) for k, v in aux.items()},
                             "learning_rate": lr},
                            f"[{cfg.name}] epoch {epoch + 1} step "
                            f"{int(state.step)} "
                            f"mse {float(aux['mse']):.4f}")
                    last_mse = float(aux["mse"])
                    if exp._guard.should_stop:
                        break
                step_host = int(state.step)
            if exp.preempted(state):
                break
            metrics = {"train_mse": last_mse}
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
