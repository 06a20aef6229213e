"""PDDM on CUB attribute vectors.

Reference: src/pddm_CUB.py:150-367 — OutputLayer projects 312-d attributes
to emb_dim; PDDM margin loss (prob[:, 0] hinge at 0.6) + 0.5x triplet,
random triplet selection over class-balanced batches.
"""

from __future__ import annotations

import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.data.cub import load_cub, sample_cub_batch
from multimodal_similarity_tpu.eval.metrics import retrieval_metrics_device
from multimodal_similarity_tpu.models import PDDM, OutputLayer
from multimodal_similarity_tpu.ops.losses import triplet_loss_masked
from multimodal_similarity_tpu.ops.mining import mine_semihard_triplets
from multimodal_similarity_tpu.train.checkpoints import CheckpointManager
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, l2_regularization, learning_rate_schedule)
from multimodal_similarity_tpu.train.steps import (
    jit_step,
    l2_normalize, masked_self_distance)
from multimodal_similarity_tpu.train.trainer import setup_experiment
from multimodal_similarity_tpu.utils.logging import MetricsLogger


def train(cfg: TrainConfig, data: Optional[dict] = None,
          result_dir: Optional[str] = None):
    result_dir = setup_experiment(cfg, result_dir=result_dir)
    logger = MetricsLogger(result_dir)
    ckpt = CheckpointManager(result_dir, cfg.name)

    if data is None:
        data = load_cub(cfg.DATA_ROOT, attributes=True)
    att_train = np.asarray(data["att_train"], np.float32)
    label_train = np.asarray(data["label_train"]).reshape(-1)
    val_att = np.asarray(data["att_test"], np.float32)
    val_labels = np.asarray(data["label_test"]).reshape(-1)

    class_idx_dict: dict = {}
    for i, l in enumerate(label_train):
        class_idx_dict.setdefault(int(l), []).append(i)

    encoder = OutputLayer(n_output=cfg.emb_dim, keep_prob=cfg.keep_prob)
    head = PDDM(n_input=cfg.emb_dim)
    a0 = jnp.asarray(att_train[:2])
    e0 = jnp.zeros((2, cfg.emb_dim), jnp.float32)
    params = {
        "encoder": encoder.init(jax.random.PRNGKey(cfg.seed), a0)["params"],
        "pddm": head.init(jax.random.PRNGKey(cfg.seed + 1), e0, e0,
                          method="score")["params"],
    }
    state = TrainState.create(params, build_optimizer(cfg.optimizer,
                                                      cfg.learning_rate))

    def make_step():
        def step(state, atts, labels, key, learning_rate):
            k_mine, k_drop = jax.random.split(key)

            def loss_fn(params):
                emb_mine = encoder.apply({"params": params["encoder"]}, atts)
                if cfg.normalized:
                    emb_mine = l2_normalize(emb_mine)
                emb_mine = jax.lax.stop_gradient(emb_mine)
                mask = jnp.ones(atts.shape[0], jnp.float32)
                dists = masked_self_distance(emb_mine, mask, cfg.metric)
                mined = mine_semihard_triplets(
                    dists, labels, k_mine, cfg.triplet_per_batch,
                    alpha=cfg.alpha, num_negative=cfg.num_negative)

                tri_idx = jnp.concatenate(
                    [mined.anchor, mined.positive, mined.negative])
                emb = encoder.apply({"params": params["encoder"]},
                                    jnp.take(atts, tri_idx, 0), train=True,
                                    rngs={"dropout": k_drop})
                if cfg.normalized:
                    emb = l2_normalize(emb)
                t = mined.anchor.shape[0]
                a, p, n = emb[:t], emb[t:2 * t], emb[2 * t:]
                metric_loss = triplet_loss_masked(a, p, n, mined.mask,
                                                  cfg.alpha)
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
                               "triplet_num": jnp.sum(mined.mask)}

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            return (state.apply_gradients(grads,
                                          learning_rate=learning_rate), aux)

        return jit_step(step)

    step_fn = make_step()

    @jax.jit
    def embed(params, x):
        e = encoder.apply({"params": params["encoder"]}, x)
        return l2_normalize(e) if cfg.normalized else e

    rng_np = np.random.RandomState(cfg.seed)
    rng = jax.random.PRNGKey(cfg.seed)
    batch = max(cfg.batch_size, 64)
    metrics = {}
    for epoch in range(cfg.max_epochs):
        lr = learning_rate_schedule(epoch, cfg.learning_rate,
                                    cfg.static_epochs, cfg.max_epochs)
        idx = sample_cub_batch(class_idx_dict, batch, rng_np)
        rng, key = jax.random.split(rng)
        state, aux = step_fn(state, jnp.asarray(att_train[idx]),
                             jnp.asarray(label_train[idx] + 1), key,
                             jnp.float32(lr))
        logger.log(int(state.step),
                   {k: float(v) for k, v in aux.items()})
        if (epoch + 1) % max(cfg.max_epochs // 5, 1) == 0 \
                or epoch == cfg.max_epochs - 1:
            val_emb = np.asarray(embed(state.params, jnp.asarray(val_att)))
            mAP, _, recalls = retrieval_metrics_device(val_emb, val_labels)
            metrics = {"val_mAP": mAP, "val_recall@1": recalls[1]}
            logger.log(int(state.step), metrics)
            if not cfg.silent_mode:
                print(f"[{cfg.name}] step {int(state.step)} "
                      f"R@1 {recalls[1]:.4f}")
            ckpt.save(state, int(state.step))

    logger.close()
    return state, metrics, result_dir


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
