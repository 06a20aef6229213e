"""Softmax-classification baseline (reference src/base_model_classifier.py:
46-217): ConvTSNClassifier, cross-entropy over event labels, accuracy
tracking.  Events stream through the session loader (fixed budget + mask)
instead of the reference's TFRecord pipeline; the TFRecord path is also
supported via data/tfrecords.py.
"""

from __future__ import annotations

import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.models import ConvTSNClassifier
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, l2_regularization, learning_rate_schedule)
from multimodal_similarity_tpu.train.trainer import (
    cached_device, epoch_of_step)
from multimodal_similarity_tpu.train.trainers._honda import HondaExperiment
from multimodal_similarity_tpu.train.steps import jit_step


def make_classifier_step(model, cfg: TrainConfig):
    def step(state, events, labels, mask, key, learning_rate):
        def loss_fn(params):
            _, logits = model.apply({"params": params}, events, train=True,
                                    rngs={"dropout": key})
            labels_v = labels.reshape(-1)
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(log_probs, labels_v[:, None],
                                       axis=-1)[:, 0]
            denom = jnp.maximum(jnp.sum(mask), 1.0)
            ce = jnp.sum(nll * mask) / denom
            correct = (jnp.argmax(logits, -1) == labels_v).astype(jnp.float32)
            acc = jnp.sum(correct * mask) / denom
            total = ce
            if cfg.lambda_l2:
                total = total + cfg.lambda_l2 * l2_regularization(params)
            return total, {"loss": total, "ce": ce, "accuracy": acc}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, learning_rate=learning_rate)
        return state, aux

    return jit_step(step)


def train(cfg: TrainConfig, event_budget: Optional[int] = None,
          result_dir: Optional[str] = None, n_output: int = 7):
    exp = HondaExperiment(cfg, event_budget=event_budget,
                          result_dir=result_dir)
    model = ConvTSNClassifier(n_seg=cfg.num_seg, emb_dim=cfg.emb_dim,
                              n_input=cfg.n_input, n_h=cfg.n_h, n_w=cfg.n_w,
                              n_C=cfg.n_C, n_output=n_output,
                              keep_prob=cfg.keep_prob)
    variables = model.init(exp.next_key(), jnp.asarray(
        np.zeros((2,) + exp.val_feats.shape[1:], np.float32)))
    state = TrainState.create(variables["params"],
                              build_optimizer(cfg.optimizer,
                                              cfg.learning_rate))

    @jax.jit
    def infer(params, x):
        _, logits = model.apply({"params": params}, x)
        return logits

    step_fn = make_classifier_step(model, cfg)

    metrics = {}
    epoch = epoch_of_step(int(state.step), exp.batch_per_epoch)
    # exp.close() must run even when the loop raises: it
    # restores the SIGTERM guard and flushes logs/traces
    try:
        while epoch < cfg.max_epochs:
            lr = learning_rate_schedule(epoch, cfg.learning_rate,
                                        cfg.static_epochs, cfg.max_epochs)
            for batch in exp.loader.epoch():
                state, aux = step_fn(
                    state, jnp.asarray(batch["events"]),
                    jnp.asarray(batch["labels"]), jnp.asarray(batch["mask"]),
                    exp.next_key(), jnp.float32(lr))
                exp.log(int(state.step),
                        {**{k: float(v) for k, v in aux.items()},
                         "learning_rate": lr},
                        f"[{cfg.name}] epoch {epoch + 1} step {int(state.step)} "
                        f"loss {float(aux['loss']):.4f} "
                        f"acc {float(aux['accuracy']):.3f}")
                if exp._guard.should_stop:
                    break
            if exp.preempted(state):
                break
            logits = np.asarray(infer(state.params, cached_device(exp.val_feats)))
            val_acc = float(np.mean(np.argmax(logits, -1)
                                    == exp.val_labels.reshape(-1)))
            metrics = {"val_accuracy": val_acc}
            exp.log(int(state.step), metrics,
                    f"[{cfg.name}] epoch {epoch + 1} val acc {val_acc:.4f}")
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
