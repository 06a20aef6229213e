"""End-to-end CUB trainer: CNN backbone + CUBLayer + batch-structured losses.

Reference: src/base_CUB.py:80-275 — slim InceptionV2 backbone (0.1x
gradient scale) + CUBLayer head, random 224 crops of 256x256 images, loss
in {triplet (tf.contrib semihard), lifted (tf.contrib lifted_struct),
mylifted (networks.lifted_loss unweighted)}; class-balanced batches of 5-10
images per class.  debug_CUB.py (reference :146-314) is the same harness
under a debug config — exposed here as ``debug=True``.

Backbones (--network): ``inception_v2`` builds the architecture-exact
slim InceptionV2 tower (models/inception_v2.py, reference
networks.py:916-947) with batch-norm statistics threaded through training
and an optional slim-checkpoint graft (``slim_checkpoint=`` .npz of slim
variable names -> arrays); any other value uses the compact ConvBackbone
stand-in (fast CPU smoke path).  Either way the tower lives under the
``InceptionV2`` param scope, so the reference's 0.1x pretrained-branch
gradient scale applies (train/state.py PRETRAINED_BRANCH_SCOPES;
reference utils.py:27-38) and ImageNet weights graft the moment a
converted checkpoint is mounted (zero-egress build: none bundled).
"""

from __future__ import annotations

import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.data.cub import sample_cub_batch
from multimodal_similarity_tpu.eval.metrics import retrieval_metrics_device
from multimodal_similarity_tpu.models import CUBLayer
from multimodal_similarity_tpu.ops.distances import pairwise_distance
from multimodal_similarity_tpu.ops.losses import (
    lifted_loss, triplet_semihard_loss)
from multimodal_similarity_tpu.ops.pallas import batch_hard_pallas
from multimodal_similarity_tpu.train.checkpoints import CheckpointManager
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, l2_regularization, learning_rate_schedule)
from multimodal_similarity_tpu.train.steps import jit_step, l2_normalize
from multimodal_similarity_tpu.train.trainer import setup_experiment
from multimodal_similarity_tpu.utils.logging import MetricsLogger


class ConvBackbone(nn.Module):
    """Compact stand-in for the InceptionV2 trunk: conv-pool stages to a
    global-average-pooled feature vector."""

    features: int = 1024
    stages: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        ch = 32
        for s in range(self.stages):
            h = nn.Conv(ch, (3, 3), strides=(2, 2), name=f"conv{s}")(h)
            h = nn.relu(h)
            ch *= 2
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.features, name="proj")(h)


def _random_crop(key, images, crop: int):
    """Random crop (train) matching the reference's tf.random_crop +
    [-1, 1] scaling (networks.py:933-937)."""
    b, h, w, _ = images.shape
    kx, ky = jax.random.split(key)
    # tf.random_crop samples offsets from [0, h - crop] INCLUSIVE;
    # randint's maxval is exclusive, so + 1 keeps the bottom/right-most
    # crop position reachable
    offs_x = jax.random.randint(kx, (b,), 0, max(h - crop, 0) + 1)
    offs_y = jax.random.randint(ky, (b,), 0, max(w - crop, 0) + 1)

    def crop_one(img, ox, oy):
        return jax.lax.dynamic_slice(img, (ox, oy, 0),
                                     (crop, crop, img.shape[-1]))

    out = jax.vmap(crop_one)(images, offs_x, offs_y)
    return (out - 0.5) * 2.0


def train(cfg: TrainConfig, data: Optional[dict] = None,
          crop: int = 56, debug: bool = False,
          slim_checkpoint: Optional[str] = None,
          result_dir: Optional[str] = None):
    """``data`` must hold image_train [N,H,W,3] float in [0,1], label_train,
    image_test, label_test (or cfg.DATA_ROOT contains the .npy files)."""
    result_dir = setup_experiment(cfg, result_dir=result_dir)
    logger = MetricsLogger(result_dir)
    ckpt = CheckpointManager(result_dir, cfg.name)

    if data is None:
        import os
        data = {k: np.load(os.path.join(cfg.DATA_ROOT, f"{k}.npy"))
                for k in ("image_train", "label_train", "image_test",
                          "label_test")}
    images = np.asarray(data["image_train"], np.float32)
    labels = np.asarray(data["label_train"]).reshape(-1)
    val_images = np.asarray(data["image_test"], np.float32)
    val_labels = np.asarray(data["label_test"]).reshape(-1)

    class_idx_dict: dict = {}
    for i, l in enumerate(labels):
        class_idx_dict.setdefault(int(l), []).append(i)

    use_inception = cfg.network == "inception_v2"
    if use_inception:
        from multimodal_similarity_tpu.models import (
            InceptionV2, graft_slim_npz)
        backbone = InceptionV2()
    else:
        backbone = ConvBackbone()
    head = CUBLayer(n_output=cfg.emb_dim, keep_prob=cfg.keep_prob)

    key = jax.random.PRNGKey(cfg.seed)
    x0 = jnp.asarray(images[:2, :crop, :crop])
    bvars = backbone.init(key, x0)
    if use_inception and slim_checkpoint:
        bvars = graft_slim_npz(bvars, slim_checkpoint)
    bn_stats = bvars.get("batch_stats", {})
    params = {
        "InceptionV2": bvars["params"],
        "CUBLayer": head.init(key, jnp.zeros((2, 1024)))["params"],
    }
    state = TrainState.create(params, build_optimizer(cfg.optimizer,
                                                      cfg.learning_rate))

    loss_kind = cfg.loss

    def make_step():
        def step(state, bn_stats, images_b, labels_b, key, learning_rate):
            k_crop, k_drop = jax.random.split(key)

            def loss_fn(params):
                x = _random_crop(k_crop, images_b, crop)
                if use_inception:
                    pool, new_vars = backbone.apply(
                        {"params": params["InceptionV2"],
                         "batch_stats": bn_stats},
                        x, train=True, mutable=["batch_stats"])
                    new_bn = new_vars["batch_stats"]
                else:
                    pool = backbone.apply(
                        {"params": params["InceptionV2"]}, x, train=True)
                    new_bn = bn_stats
                emb = head.apply({"params": params["CUBLayer"]}, pool,
                                 train=True, rngs={"dropout": k_drop})
                if cfg.normalized:
                    emb = l2_normalize(emb)
                if loss_kind == "triplet":
                    metric = triplet_semihard_loss(labels_b, emb, cfg.alpha)
                elif loss_kind == "lifted":
                    # batch-hard-style masked lifted via the fused kernel
                    # family is the 'mylifted' path; tf.contrib
                    # lifted_struct maps to our lifted_loss unweighted
                    dists = pairwise_distance(emb, emb, "euclidean")
                    metric = lifted_loss(dists,
                                         labels_b.astype(jnp.float32),
                                         cfg.alpha, weighted=False)[0]
                elif loss_kind == "mylifted":
                    dists = pairwise_distance(emb, emb, "squaredeuclidean")
                    metric = lifted_loss(dists,
                                         labels_b.astype(jnp.float32),
                                         cfg.alpha, weighted=False)[0]
                elif loss_kind == "batchhard":
                    metric = batch_hard_pallas(emb, labels_b, "soft",
                                               weighted=False)[0]
                else:
                    raise NotImplementedError(loss_kind)
                total = metric
                if cfg.lambda_l2:
                    total = total + cfg.lambda_l2 * l2_regularization(params)
                return total, ({"loss": total, "metric_loss": metric},
                               new_bn)

            (_, (aux, new_bn)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return (state.apply_gradients(grads,
                                          learning_rate=learning_rate),
                    new_bn, aux)

        return jit_step(step)

    step_fn = make_step()

    @jax.jit
    def embed(params, bn_stats, images_b):
        # center crop at eval
        h = images_b.shape[1]
        off = (h - crop) // 2
        x = (images_b[:, off:off + crop, off:off + crop] - 0.5) * 2.0
        if use_inception:
            pool = backbone.apply({"params": params["InceptionV2"],
                                   "batch_stats": bn_stats}, x)
        else:
            pool = backbone.apply({"params": params["InceptionV2"]}, x)
        emb = head.apply({"params": params["CUBLayer"]}, pool)
        return l2_normalize(emb) if cfg.normalized else emb

    rng_np = np.random.RandomState(cfg.seed)
    batch = max(cfg.batch_size, 32)
    metrics = {}
    max_epochs = 2 if debug else cfg.max_epochs
    for epoch in range(max_epochs):
        lr = learning_rate_schedule(epoch, cfg.learning_rate,
                                    cfg.static_epochs, max_epochs)
        idx = sample_cub_batch(class_idx_dict, batch, rng_np)
        key, k = jax.random.split(key)
        state, bn_stats, aux = step_fn(
            state, bn_stats, jnp.asarray(images[idx]),
            jnp.asarray(labels[idx]), k, jnp.float32(lr))
        logger.log(int(state.step), {k2: float(v) for k2, v in aux.items()})
        if (epoch + 1) % max(max_epochs // 5, 1) == 0 \
                or epoch == max_epochs - 1:
            val_emb = np.asarray(embed(state.params, bn_stats,
                                       jnp.asarray(val_images)))
            mAP, _, recalls = retrieval_metrics_device(val_emb, val_labels)
            metrics = {"val_mAP": mAP, "val_recall@1": recalls[1]}
            logger.log(int(state.step), metrics)
            if not cfg.silent_mode:
                print(f"[{cfg.name}] step {int(state.step)} "
                      f"R@1 {recalls[1]:.4f}")
            ckpt.save({"state": state, "batch_stats": bn_stats},
                      int(state.step))

    logger.close()
    return state, metrics, result_dir


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
