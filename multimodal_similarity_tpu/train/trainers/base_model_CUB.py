"""CUB-200 feature-level triplet retrieval trainer.

Reference: src/base_model_CUB.py:149-321 — CUBLayer projection over
precomputed 1024-d features, class-balanced batches (sampled classes with
5-10 images each), facenet or random triplet mining, Recall@K validation on
the test split.  This is the minimum CPU-runnable end-to-end slice
(SURVEY.md §7) and the CUB Recall@1 parity gate (BASELINE.md).

Run:  python -m multimodal_similarity_tpu.train.trainers.base_model_CUB \
          --DATA_ROOT <dir with feat_train.npy ...> --emb_dim 64 ...
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
from multimodal_similarity_tpu.models import CUBLayer
from multimodal_similarity_tpu.train.checkpoints import CheckpointManager
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, learning_rate_schedule)
from multimodal_similarity_tpu.train.steps import (
    l2_normalize, make_triplet_train_step)
from multimodal_similarity_tpu.train.trainer import setup_experiment
from multimodal_similarity_tpu.utils.logging import MetricsLogger


def train(cfg: TrainConfig, data: Optional[dict] = None,
          result_dir: Optional[str] = None):
    """``data`` overrides loading from cfg.DATA_ROOT (tests)."""
    result_dir = setup_experiment(cfg, result_dir=result_dir)
    logger = MetricsLogger(result_dir)
    ckpt = CheckpointManager(result_dir, cfg.name)

    if data is None:
        data = load_cub(cfg.DATA_ROOT)
    feat_train = np.asarray(data["feat_train"], np.float32)
    label_train = np.asarray(data["label_train"]).reshape(-1)
    val_feats = np.asarray(data["feat_test"], np.float32)
    val_labels = np.asarray(data["label_test"]).reshape(-1)

    class_idx_dict: dict = {}
    for i, l in enumerate(label_train):
        class_idx_dict.setdefault(int(l), []).append(i)

    model = CUBLayer(n_output=cfg.emb_dim, keep_prob=cfg.keep_prob)
    variables = model.init(jax.random.PRNGKey(cfg.seed),
                           jnp.asarray(feat_train[:2]))
    state = TrainState.create(variables["params"],
                              build_optimizer(cfg.optimizer,
                                              cfg.learning_rate))

    # CUB has no background class: every label anchors (the miner treats
    # label 0 as background, and CUB train labels are 0-based, so shift +1)
    step_fn = make_triplet_train_step(
        model, triplet_per_batch=cfg.triplet_per_batch, alpha=cfg.alpha,
        num_negative=cfg.num_negative, metric=cfg.metric,
        normalized=cfg.normalized, lambda_l2=cfg.lambda_l2)

    @jax.jit
    def embed(params, x):
        e = model.apply({"params": params}, x)
        return l2_normalize(e) if cfg.normalized else e

    rng_np = np.random.RandomState(cfg.seed)
    rng = jax.random.PRNGKey(cfg.seed)
    batch = max(cfg.batch_size, 64)
    metrics = {}
    for epoch in range(cfg.max_epochs):
        lr = learning_rate_schedule(epoch, cfg.learning_rate,
                                    cfg.static_epochs, cfg.max_epochs)
        idx = sample_cub_batch(class_idx_dict, batch, rng_np)
        events = jnp.asarray(feat_train[idx])
        labels = jnp.asarray(label_train[idx] + 1)  # 0 is background-free
        mask = jnp.ones(len(idx), jnp.float32)
        rng, key = jax.random.split(rng)
        state, aux = step_fn(state, events, labels, mask, key,
                             jnp.float32(lr))
        scalars = {k: float(v) for k, v in aux.items()}
        scalars["learning_rate"] = lr
        logger.log(int(state.step), scalars)
        if not cfg.silent_mode and (epoch + 1) % 50 == 0:
            print(f"[{cfg.name}] step {int(state.step)} "
                  f"loss {scalars['loss']:.4f} "
                  f"triplets {scalars['triplet_num']:.0f}")

        if (epoch + 1) % max(cfg.max_epochs // 5, 1) == 0 \
                or epoch == cfg.max_epochs - 1:
            val_emb = np.asarray(embed(state.params, jnp.asarray(val_feats)))
            mAP, mPrec, recalls = retrieval_metrics_device(val_emb,
                                                           val_labels)
            metrics = {"val_mAP": mAP, "val_recall@1": recalls[1],
                       "val_recall@2": recalls[2],
                       "val_recall@4": recalls[4],
                       "val_recall@8": recalls[8]}
            logger.log(int(state.step), metrics)
            if not cfg.silent_mode:
                print(f"[{cfg.name}] step {int(state.step)} "
                      f"R@1 {recalls[1]:.4f} mAP {mAP:.4f}")
            ckpt.save(state, int(state.step))

    logger.close()
    return state, metrics, result_dir


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
