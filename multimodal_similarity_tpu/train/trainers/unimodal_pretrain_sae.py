"""Seq2seqTSN autoencoder pretraining (unsupervised).

Reference: src/unimodal_pretrain_sae.py:25-200 — MSE reconstruction of TSN
segment inputs through the LSTM encoder-decoder (loss :69); --reverse
selects reversed input order.  Mode 'sae' uses the plain tied-weight SAE on
flattened inputs instead.
"""

from __future__ import annotations

import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.models import SAE, Seq2seqTSN
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, l2_regularization, learning_rate_schedule)
from multimodal_similarity_tpu.train.trainer import (
    cached_device, epoch_of_step)
from multimodal_similarity_tpu.train.trainers._honda import HondaExperiment
from multimodal_similarity_tpu.train.steps import dequant_features, jit_step


def train(cfg: TrainConfig, mode: str = "seq2seq",
          event_budget: Optional[int] = None,
          result_dir: Optional[str] = None):
    exp = HondaExperiment(cfg, event_budget=event_budget,
                          result_dir=result_dir, limit_label_num=False)
    n_input = exp.val_feats.shape[-1]
    if mode == "seq2seq":
        model = Seq2seqTSN(n_seg=cfg.num_seg, n_input=n_input,
                           emb_dim=cfg.emb_dim, reverse=cfg.reverse,
                           keep_prob=cfg.keep_prob)
    else:
        model = SAE(n_input=n_input, emb_dim=cfg.emb_dim)

    x0 = jnp.asarray(np.zeros((2,) + exp.val_feats.shape[1:], np.float32))
    if mode != "seq2seq":
        x0 = x0.reshape(2, -1)
    variables = model.init(exp.next_key(), x0)
    state = TrainState.create(variables["params"],
                              build_optimizer(cfg.optimizer,
                                              cfg.learning_rate))

    def step_fn_builder(jit=True):
        def step(state, events, mask, key, learning_rate):
            def loss_fn(params):
                # feed-polymorphic: dense f32 from the loader, or the int8
                # {"q", "scale"} dict from the device cache's fused gather
                feats = dequant_features(events)
                x = feats if mode == "seq2seq" else \
                    feats.reshape(feats.shape[0], -1)
                _, recon = model.apply({"params": params}, x, train=True,
                                       rngs={"dropout": key})
                sq = jnp.mean(jnp.square(x - recon).reshape(
                    x.shape[0], -1), axis=1)
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

    # --device_cache: the train set lives in HBM as int8; epochs gather
    # fresh TSN segments on device and the link carries only index plans
    cache = exp.build_cache()
    if cache is not None:
        raw = step_fn_builder(jit=False)
        fused, multi, cache_ops = exp.cached_programs(
            cache, lambda st, ev, lab, m, k, lr_: raw(st, ev[0], m, k, lr_))

    # hoisted so the cached_device one-slot cache sees a stable object
    val_x_host = exp.val_feats if mode == "seq2seq" else \
        exp.val_feats.reshape(exp.val_feats.shape[0], -1)

    metrics = {}
    step_host = int(state.step)
    epoch = epoch_of_step(step_host, exp.batch_per_epoch)
    # exp.close() must run even when the loop raises: it
    # restores the SIGTERM guard and flushes logs/traces
    try:
        while epoch < cfg.max_epochs:
            lr = learning_rate_schedule(epoch, cfg.learning_rate,
                                        cfg.static_epochs, cfg.max_epochs)
            if cache is not None:
                state, step_host, _ = exp.run_cached_epoch(
                    cache, state, fused=fused, multi=multi,
                    cache_ops=cache_ops, lr=lr, step_host=step_host,
                    epoch=epoch,
                    echo=lambda e, s, sc: (
                        f"[{cfg.name}] epoch {e + 1} step {s} "
                        f"mse {sc['mse']:.4f}"))
            else:
                for batch in exp.loader.epoch():
                    state, aux = step_fn(state, jnp.asarray(batch["events"]),
                                         jnp.asarray(batch["mask"]),
                                         exp.next_key(), jnp.float32(lr))
                    exp.log(int(state.step),
                            {**{k: float(v) for k, v in aux.items()},
                             "learning_rate": lr},
                            f"[{cfg.name}] epoch {epoch + 1} step "
                            f"{int(state.step)} "
                            f"mse {float(aux['mse']):.4f}")
                    if exp._guard.should_stop:
                        break
                step_host = int(state.step)
            if exp.preempted(state):
                break
            # validation reconstruction error
            x = cached_device(val_x_host)
            _, recon = model.apply({"params": state.params}, x)
            val_mse = float(jnp.mean(jnp.square(x - recon)))
            metrics = {"val_mse": val_mse}
            exp.log(step_host, metrics,
                    f"[{cfg.name}] epoch {epoch + 1} val mse {val_mse:.4f}")
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
