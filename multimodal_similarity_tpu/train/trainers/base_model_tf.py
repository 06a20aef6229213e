"""TFRecord-pipeline triplet trainer with true sequence lengths.

Reference: src/base_model_tf.py:104-319 — the event-TFRecord variant of the
base trainer using ConvLSTM over full (padded) frame sequences with real
seq_len gathers.  The reference copy is bit-rotted (NameError at :91,
undefined timer at :272, SURVEY.md §7); this implements the intended
semantics: stream events from tfrecords, embed with ConvLSTM, fused
on-device semi-hard mining, triplet loss.
"""

from __future__ import annotations

import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.data.tfrecord_loader import (
    EventTFRecordLoader, list_event_tfrecords)
from multimodal_similarity_tpu.eval.metrics import retrieval_metrics_device
from multimodal_similarity_tpu.models import ConvLSTM
from multimodal_similarity_tpu.ops.losses import triplet_loss_masked
from multimodal_similarity_tpu.ops.mining import mine_semihard_triplets
from multimodal_similarity_tpu.train.checkpoints import CheckpointManager
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, l2_regularization, learning_rate_schedule)
from multimodal_similarity_tpu.train.steps import (
    jit_step,
    l2_normalize, masked_self_distance)
from multimodal_similarity_tpu.train.trainer import (
    epoch_of_step, setup_experiment)
from multimodal_similarity_tpu.utils.logging import MetricsLogger


def train(cfg: TrainConfig, event_per_batch: int = 64,
          result_dir: Optional[str] = None):
    result_dir = setup_experiment(cfg, result_dir=result_dir)
    logger = MetricsLogger(result_dir)
    ckpt = CheckpointManager(result_dir, cfg.name)

    feat = cfg.feat if isinstance(cfg.feat, str) else cfg.feat[0]
    flat_dim = int(np.prod(cfg.feat_dim.get(feat, (cfg.n_input,))))
    max_time = cfg.MAX_LENGTH_FRAMES
    spatial = cfg.feat_dim.get(feat, None)
    n_h, n_w, n_c_in = (spatial if spatial and len(spatial) == 3
                        else (1, 1, flat_dim))

    train_paths = list_event_tfrecords(cfg.tfrecords_root, cfg.train_session)
    val_paths = list_event_tfrecords(cfg.tfrecords_root, cfg.val_session)
    if not train_paths:
        raise FileNotFoundError(
            f"no event tfrecords under {cfg.tfrecords_root} "
            "(run data.tfrecords.generate_event_tfrecords first)")

    loader = EventTFRecordLoader(train_paths, feat, flat_dim,
                                 event_per_batch, max_time, seed=cfg.seed)
    batch_per_epoch = loader.batches_per_epoch

    model = ConvLSTM(max_time=max_time, emb_dim=cfg.emb_dim, n_input=n_c_in,
                     n_h=n_h, n_w=n_w, n_C=cfg.n_C)

    def reshape_frames(x):
        return x.reshape(x.shape[0], max_time, n_h, n_w, n_c_in)

    x0 = jnp.zeros((2, max_time, n_h, n_w, n_c_in), jnp.float32)
    variables = model.init(jax.random.PRNGKey(cfg.seed), x0,
                           jnp.ones((2,), jnp.int32))
    state = TrainState.create(variables["params"],
                              build_optimizer(cfg.optimizer,
                                              cfg.learning_rate))

    def make_step():
        def step(state, frames, seq_len, labels, mask, key, learning_rate):
            k_mine, k_drop = jax.random.split(key)

            def loss_fn(params):
                emb_mine = model.apply({"params": params}, frames, seq_len)
                if cfg.normalized:
                    emb_mine = l2_normalize(emb_mine)
                emb_mine = jax.lax.stop_gradient(emb_mine)
                dists = masked_self_distance(emb_mine, mask, cfg.metric)
                mined = mine_semihard_triplets(
                    dists, labels, k_mine, cfg.triplet_per_batch,
                    alpha=cfg.alpha, num_negative=cfg.num_negative,
                    valid=mask)
                tri_idx = jnp.concatenate(
                    [mined.anchor, mined.positive, mined.negative])
                emb = model.apply({"params": params},
                                  jnp.take(frames, tri_idx, 0),
                                  jnp.take(seq_len, tri_idx, 0))
                if cfg.normalized:
                    emb = l2_normalize(emb)
                t = mined.anchor.shape[0]
                loss = triplet_loss_masked(emb[:t], emb[t:2 * t],
                                           emb[2 * t:], mined.mask,
                                           cfg.alpha)
                total = loss
                if cfg.lambda_l2:
                    total = total + cfg.lambda_l2 * l2_regularization(params)
                return total, {"loss": total,
                               "triplet_num": jnp.sum(mined.mask),
                               "active_count": mined.active_count}

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            return (state.apply_gradients(grads,
                                          learning_rate=learning_rate), aux)

        return jit_step(step)

    step_fn = make_step()

    @jax.jit
    def embed(params, frames, seq_len):
        e = model.apply({"params": params}, frames, seq_len)
        return l2_normalize(e) if cfg.normalized else e

    metrics = {}
    from multimodal_similarity_tpu.utils.preemption import PreemptionGuard
    from multimodal_similarity_tpu.utils.watchdog import install_hang_watchdog
    guard = PreemptionGuard().install()
    watchdog = install_hang_watchdog(cfg.name, cfg.watchdog_secs, guard)
    epoch = epoch_of_step(int(state.step), batch_per_epoch)
    # try/finally matches every other trainer: an exception mid-training
    # must restore the process-global SIGTERM handler and flush the logs
    try:
        while epoch < cfg.max_epochs:
            lr = learning_rate_schedule(epoch, cfg.learning_rate,
                                        cfg.static_epochs, cfg.max_epochs)
            step_at_epoch_start = int(state.step)
            for batch in loader.epoch():
                frames = jnp.asarray(reshape_frames(batch["features"]))
                state, aux = step_fn(
                    state, frames, jnp.asarray(batch["seq_len"]),
                    jnp.asarray(batch["labels"]), jnp.asarray(batch["mask"]),
                    jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                                       int(state.step)),
                    jnp.float32(lr))
                logger.log(int(state.step),
                           {k: float(v) for k, v in aux.items()})
                if watchdog is not None:
                    watchdog.beat()  # scalars read back: step completed
                if not cfg.silent_mode:
                    print(f"[{cfg.name}] epoch {epoch + 1} "
                          f"step {int(state.step)} "
                          f"loss {float(aux['loss']):.4f}")
                if guard.should_stop:
                    break
            if guard.should_stop:
                # preemption (SIGTERM grace window): checkpoint the exact
                # step and exit cleanly; --model_path resumes from here
                from multimodal_similarity_tpu.utils.preemption import (
                    report_preemption)
                report_preemption(cfg.name, state, ckpt)
                break
            if int(state.step) == step_at_epoch_start:
                print(f"[{cfg.name}] epoch {epoch + 1}: no trainable batch; stopping")
                break
            if val_paths:
                val_loader = EventTFRecordLoader(
                    val_paths, feat, flat_dim, event_per_batch, max_time,
                    shuffle=False)
                embs, labs = [], []
                for vb in val_loader.epoch():
                    n = int(vb["num_events"])
                    e = embed(state.params,
                              jnp.asarray(reshape_frames(vb["features"])),
                              jnp.asarray(vb["seq_len"]))
                    embs.append(np.asarray(e)[:n])
                    labs.append(vb["labels"][:n])
                mAP, mPrec, recalls = retrieval_metrics_device(
                    np.concatenate(embs), np.concatenate(labs))
                metrics = {"val_mAP": mAP, "val_recall@1": recalls[1]}
                logger.log(int(state.step), metrics)
            ckpt.save(state, int(state.step))
            epoch = epoch_of_step(int(state.step), batch_per_epoch)
    finally:
        if watchdog is not None:
            watchdog.cancel()
        guard.restore()
        logger.close()
    return state, metrics, result_dir


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
