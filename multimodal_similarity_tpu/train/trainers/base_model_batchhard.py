"""Batch-hard trainer on class-balanced batches.

Reference: src/base_model_batchhard.py:68-260 — round-robin class-balanced
batch builder + the "In Defense of the Triplet Loss" batch-hard objective.
TPU-first: the pairwise distance matrix + hardest-pair reduction run in the
fused Pallas kernel (ops/pallas/batch_hard.py); the balanced batch indices
stay host-side in the loader.

Run:  python -m multimodal_similarity_tpu.train.trainers.base_model_batchhard
"""

from __future__ import annotations

import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.models import build_encoder
from multimodal_similarity_tpu.ops.mining import select_batch_balanced
from multimodal_similarity_tpu.ops.pallas import (
    batch_hard_pallas, lifted_loss_pallas)
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, l2_regularization, learning_rate_schedule)
from multimodal_similarity_tpu.train.steps import (
    jit_step, l2_normalize, make_embed_fn)
from multimodal_similarity_tpu.train.trainer import epoch_of_step, validate
from multimodal_similarity_tpu.train.trainers._honda import HondaExperiment


def make_balanced_batch_step(model, cfg: TrainConfig, loss_kind: str,
                             mesh=None, cache=None,
                             steps_per_dispatch: int = 1):
    """step(state, events [B], labels [B], key, lr) for batch-structured
    losses over a class-balanced batch.

    With ``mesh`` (1-D "data" mesh) the step runs data-parallel: events
    sharded on the batch axis, and the O(B^2) pass runs as a RING — each
    device reduces its anchor shard against the visiting embedding shard
    and forwards it over ICI, so the full value matrix never exists on
    any chip: batch-hard via parallel/ring_mining.py (masked max/min),
    lifted via parallel/ring_lifted.py (online logsumexp with a rotating
    column-gradient buffer in the backward ring).

    With ``cache`` (data/device_cache.DeviceFeatureCache) the step also
    subsumes the TSN gather + the balanced row take: its signature becomes
    ``(state, packed, rows, labels, key, lr, *cache.step_operands())``
    where ``rows`` indexes the balanced selection into the gathered budget
    batch — one KB-scale upload + one dispatch per batch (the cached twin
    of train/cached_steps.py).

    With ``steps_per_dispatch`` K > 1 (requires ``cache``), the returned
    program runs K whole optimizer steps as ONE dispatch —
    ``lax.scan`` over the fused gather+take+train body with stacked
    leading-K plan/rows/labels/keys operands:
    ``(state, packed [K, ...], rows [K, B], labels [K, B], keys [K],
    lr, *cache.step_operands()) -> (state, aux-of-[K]-arrays)``.
    Numerically identical to K calls of the K=1 fused step under the
    same key sequence (scan carries the same state chain); on a
    high-latency link this divides the measured governing per-step cost
    (the dispatch RPC) by K."""
    margin = "soft" if (loss_kind == "batchhard" and not cfg.no_soft) \
        else cfg.alpha
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        data_s = NamedSharding(mesh, P("data"))
        repl_s = NamedSharding(mesh, P())
        if loss_kind == "batchhard":
            from multimodal_similarity_tpu.parallel import (
                make_ring_batch_hard_loss)
            ring_loss = make_ring_batch_hard_loss(mesh, margin,
                                                  weighted=True)
        else:
            from multimodal_similarity_tpu.parallel import (
                make_ring_lifted_loss)
            ring_loss = make_ring_lifted_loss(mesh, margin, weighted=True)

    def step(state, events, labels, key, learning_rate):
        from multimodal_similarity_tpu.train.steps import dequant_features

        def loss_fn(params):
            emb = model.apply({"params": params}, dequant_features(events),
                              train=True, rngs={"dropout": key})
            if cfg.normalized:
                emb = l2_normalize(emb)
            if mesh is not None:
                # both losses ride the ring on a mesh: shard-resident
                # O(B^2/n_dev) per chip, ppermute over ICI
                emb = jax.lax.with_sharding_constraint(emb, data_s)
                loss, num_active, *_ = ring_loss(emb, labels)
            elif loss_kind == "batchhard":
                loss, num_active, *_ = batch_hard_pallas(
                    emb, labels, margin, weighted=True)
            else:
                # normalized embeddings bound the value matrices, which
                # unlocks the faster triangular no-max-tracking forward
                loss, num_active, *_ = lifted_loss_pallas(
                    emb, labels, cfg.alpha, weighted=True,
                    bounded=cfg.normalized)
            total = loss
            if cfg.lambda_l2:
                total = total + cfg.lambda_l2 * l2_regularization(params)
            return total, {"loss": total, "metric_loss": loss,
                           "active_count": num_active}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, learning_rate=learning_rate)
        return state, aux

    if cache is not None:
        # fused gather+take+train: TSN-select the budget batch from the
        # device-resident int8 cache, row-take the balanced selection, and
        # run the identical loss body — all INSIDE one jitted program.
        gather_fn = cache.gather_fn
        from multimodal_similarity_tpu.train.steps import take_features

        def cached(state, packed, rows, labels, key, learning_rate,
                   seq_len, label_table, *mods):
            k_gather, k_drop = jax.random.split(key)
            if mesh is None:
                packed_local = packed[0] if packed.ndim == 2 else packed
                gathered, _, _ = gather_fn(k_gather, packed_local, seq_len,
                                           label_table, *mods)
            else:
                gathered, _, _ = gather_fn(k_gather, packed, seq_len,
                                           label_table, *mods)
            events = take_features(gathered[0], rows)
            if mesh is not None:
                events = jax.tree.map(
                    lambda a: jax.lax.with_sharding_constraint(
                        a, NamedSharding(
                            mesh, P("data", *([None] * (a.ndim - 1))))),
                    events)
            return step(state, events, labels, k_drop, learning_rate)

        if steps_per_dispatch > 1:
            # K optimizer steps per program: scan the fused body over
            # stacked [K, ...] plan operands; the cache arrays are
            # loop-invariant residuals (never copied per step)
            def cached_multi(state, packed_k, rows_k, labels_k, keys_k,
                             learning_rate, seq_len, label_table, *mods):
                def body(st, xs):
                    packed, rows, labels, key = xs
                    return cached(st, packed, rows, labels, key,
                                  learning_rate, seq_len, label_table,
                                  *mods)
                return jax.lax.scan(
                    body, state, (packed_k, rows_k, labels_k, keys_k))

            if mesh is None:
                return jit_step(cached_multi)
            packed_ks = NamedSharding(mesh, P(None, "data", None))
            row = lambda a: NamedSharding(  # noqa: E731
                mesh, P("data", *([None] * (a.ndim - 1))))
            operand_s = tuple(row(a) for a in cache.step_operands())
            return jit_step(cached_multi, in_shardings=(
                None, packed_ks, repl_s, repl_s, repl_s, repl_s,
                *operand_s))

        if mesh is None:
            return jit_step(cached)
        packed_s = NamedSharding(mesh, P("data", None))
        row = lambda a: NamedSharding(  # noqa: E731
            mesh, P("data", *([None] * (a.ndim - 1))))
        operand_s = tuple(row(a) for a in cache.step_operands())
        return jit_step(cached, in_shardings=(
            None, packed_s, repl_s, repl_s, repl_s, repl_s, *operand_s))

    if mesh is None:
        return jit_step(step)
    return jit_step(step, in_shardings=(None, data_s, repl_s, repl_s, repl_s))


def train(cfg: TrainConfig, loss_kind: str = "batchhard",
          event_budget: Optional[int] = None,
          result_dir: Optional[str] = None):
    exp = HondaExperiment(cfg, event_budget=event_budget,
                          result_dir=result_dir, supports_int8=True)
    from multimodal_similarity_tpu.train.trainer import feature_caster
    _cast = feature_caster(cfg)
    model = build_encoder(cfg.network, num_seg=cfg.num_seg,
                          emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                          n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C,
                          keep_prob=cfg.keep_prob)
    variables = model.init(exp.next_key(), jnp.asarray(
        np.zeros((2,) + exp.val_feats.shape[1:], np.float32)))
    state = TrainState.create(variables["params"],
                              build_optimizer(cfg.optimizer,
                                              cfg.learning_rate))
    if cfg.model_path:
        from multimodal_similarity_tpu.train.checkpoints import load_pytree
        state = load_pytree(cfg.model_path, state)

    embed_fn = make_embed_fn(model, cfg.normalized)
    batch_size = cfg.batch_size if cfg.batch_size > 8 else 64
    # >1 device: shard the balanced batch and run the ring batch-hard pass
    if cfg.model_parallel > 1:
        # dp x tp: the encoder's wide kernels (and Adam moments) column-
        # shard over "model" while the O(B^2) loss still rides the ring
        # over "data" — the ring's shard_map specs never mention "model",
        # so each tp column runs the (KB-scale) reduction replicated
        from multimodal_similarity_tpu.parallel import (
            auto_mesh_tp, shard_state_tp, tp_sharded_leaves)
        mesh, batch_size = auto_mesh_tp(batch_size, cfg.model_parallel,
                                        verbose=not cfg.silent_mode)
        sharded = tp_sharded_leaves(state.params, mesh)
        if not sharded:
            raise ValueError(
                f"--model_parallel {cfg.model_parallel}: no parameter has "
                f"a trailing dim divisible by {cfg.model_parallel} "
                f"(emb_dim {cfg.emb_dim}); tensor parallelism would be a "
                "silent no-op")
        state = shard_state_tp(state, mesh)
        if not cfg.silent_mode:
            print(f"[{cfg.name}] {loss_kind}: {len(sharded)} weight "
                  f"tensors column-sharded over {cfg.model_parallel} "
                  f"chips x {mesh.shape['data']}-way data parallel")
    else:
        from multimodal_similarity_tpu.parallel import auto_mesh
        mesh, batch_size = auto_mesh(batch_size,
                                     verbose=not cfg.silent_mode)
        if mesh is not None:
            state = jax.device_put(state, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))
    if mesh is not None and not cfg.silent_mode:
        print(f"[{cfg.name}] {loss_kind} data-parallel over "
              f"{mesh.shape['data']} devices"
              + (" (ring mining)" if loss_kind == "batchhard" else ""))
    step_fn = make_balanced_batch_step(model, cfg, loss_kind, mesh=mesh)

    # the balanced selection needs only host-resident labels, so it runs
    # ON the prefetch thread: each loader batch is reduced to its selected
    # [B] slice there, cast (bf16 when asked), and device_put one batch
    # ahead — the upload overlaps the previous fused step, and the stream
    # stays warm across epochs (same design as base_model).  An explicit
    # config-seeded rng replaces the global `random` the selection used
    # before: draws move off the main thread AND become reproducible.
    import random as _random
    sel_rng = _random.Random(cfg.seed)

    # --device_cache: windows resident in HBM as int8; the balanced
    # selection runs on the plan's host labels and the [B] slice is a
    # device-side row take from the cached budget batch — no feature
    # bytes cross the link after the one-time upload
    cache = None
    if cfg.device_cache:
        if cfg.bf16_features:
            raise ValueError("--device_cache stores int8; it excludes "
                             "--bf16_features")
        from multimodal_similarity_tpu.data.device_cache import (
            DeviceFeatureCache, cache_budget_bytes)
        budget = event_budget or cfg.event_per_batch
        n_dev = mesh.shape["data"] if mesh is not None else 1
        budget = -(-budget // n_dev) * n_dev
        cache = DeviceFeatureCache.build(
            exp.train_set, n_seg=cfg.num_seg,
            sess_per_batch=cfg.sess_per_batch, event_budget=budget,
            seed=cfg.seed, mesh=mesh, beat=exp.beat_fn,
            budget_bytes=cache_budget_bytes(cfg.device_cache_gb),
            verbose=not cfg.silent_mode)
        if cache is not None:
            exp.batch_per_epoch = cache.batches_per_epoch
            # single-dispatch path: TSN gather + balanced row take run
            # INSIDE the train program; a batch costs one packed upload
            step_fn = make_balanced_batch_step(model, cfg, loss_kind,
                                               mesh=mesh, cache=cache)
            cache_ops = cache.step_operands()
            multi_fn = None
            if cfg.steps_per_dispatch > 1:
                # --steps_per_dispatch: K whole optimizer steps per
                # program (lax.scan over the fused body); full windows
                # ride multi_fn, the epoch-tail remainder rides step_fn
                multi_fn = make_balanced_batch_step(
                    model, cfg, loss_kind, mesh=mesh, cache=cache,
                    steps_per_dispatch=cfg.steps_per_dispatch)
                from multimodal_similarity_tpu.data.device_cache import (
                    notice_window_shortfall)
                notice_window_shortfall(cache, cfg.steps_per_dispatch,
                                        cfg.name, cfg.silent_mode)

    def continuous_selected():
        def epochs():
            while True:
                produced = 0
                for b in exp.loader.epoch():
                    produced += 1
                    n = int(b["num_events"])
                    idx = select_batch_balanced(b["labels"][:n], batch_size,
                                                rng=sel_rng)
                    if idx.size == 0:
                        # keep 1 stream item per loader batch so epoch
                        # slicing stays aligned; consumer skips these
                        yield {"empty": True}
                        continue
                    yield {"events": _cast(b["events"][idx]),
                           "labels": b["labels"][idx]}
                if not produced:
                    return

        if cache is not None:
            # balanced selection runs on the PLAN's host labels; the fused
            # step gathers + row-takes + trains in one program, so the
            # link carries only the packed plan + the [B] selection
            def cached_selected():
                while True:
                    for plan in cache.epoch_plans():
                        valid = np.where(plan["mask_host"] > 0)[0]
                        idx = select_batch_balanced(
                            plan["labels_host"][valid], batch_size,
                            rng=sel_rng)
                        if idx.size == 0:
                            yield {"empty": True}
                            continue
                        rows = valid[idx].astype(np.int32)
                        yield {"packed": plan["packed"], "rows": rows,
                               "labels": plan["labels_host"][rows]}
            return cached_selected()

        from multimodal_similarity_tpu.data import (
            device_prefetch, feed_shardings)
        shardings = None
        if mesh is not None:
            shardings = feed_shardings(mesh, data_keys=("events",),
                                       replicated_keys=("labels",))
        return device_prefetch(
            epochs(), device_keys=("events", "labels"),
            shardings=shardings,
            int8_keys=("events",) if cfg.int8_features else ())

    metrics = {}
    import itertools
    stream = continuous_selected()
    try:
        # host-side step counter: the loop never calls int(state.step)
        # per step (that blocks on the WHOLE step result and serializes
        # dispatch); metrics ride exp.log_deferred and read back every
        # --log_flush_every steps
        step_host = int(state.step)
        epoch = epoch_of_step(step_host, exp.batch_per_epoch)
        while epoch < cfg.max_epochs:
            lr = learning_rate_schedule(epoch, cfg.learning_rate,
                                        cfg.static_epochs, cfg.max_epochs)
            step_at_epoch_start = step_host
            batch_iter = itertools.islice(stream, exp.batch_per_epoch)
            if cache is not None and cfg.steps_per_dispatch > 1:
                # windowed multi-step dispatch: the epoch's (KB-scale)
                # plans are host-side, so materialize them, stack K at a
                # time, and pay ONE dispatch per window; the remainder
                # (< K batches at the epoch tail) rides the K=1 step so
                # no batch is dropped.  Preemption polls at window
                # boundaries (documented on --steps_per_dispatch).
                # Falls through to the shared epoch epilogue below.
                from multimodal_similarity_tpu.train.cached_steps import (
                    dispatch_plan_window)
                K = cfg.steps_per_dispatch
                valid = [b for b in batch_iter if "empty" not in b]
                for start in range(0, len(valid), K):
                    win = valid[start:start + K]
                    state, aux_list = dispatch_plan_window(
                        state, win, [exp.next_key() for _ in win], lr,
                        fused=step_fn, multi=multi_fn, k=K,
                        plan_args=lambda b: (b["packed"], b["rows"],
                                             b["labels"]),
                        cache_ops=cache_ops)
                    for aux in aux_list:
                        step_host += 1
                        exp.log_deferred(
                            step_host, aux, {"learning_rate": lr},
                            echo_fn=lambda sc, e=epoch, s=step_host: (
                                f"[{cfg.name}] epoch {e + 1} step {s} "
                                f"loss {sc['loss']:.4f}"))
                    if exp._guard.should_stop:
                        break
                batch_iter = iter(())  # fully consumed (or stopped) above
            for batch in batch_iter:
                if "empty" in batch:
                    continue  # no balanced batch in this loader draw
                if cache is not None:
                    # fused gather+take+train: one packed upload, one dispatch
                    state, aux = step_fn(
                        state, batch["packed"], jnp.asarray(batch["rows"]),
                        jnp.asarray(batch["labels"]), exp.next_key(),
                        jnp.float32(lr), *cache_ops)
                else:
                    state, aux = step_fn(
                        state, batch["events"], batch["labels"],
                        exp.next_key(), jnp.float32(lr))
                step_host += 1
                exp.log_deferred(
                    step_host, aux, {"learning_rate": lr},
                    echo_fn=lambda sc, e=epoch, s=step_host: (
                        f"[{cfg.name}] epoch {e + 1} step {s} "
                        f"loss {sc['loss']:.4f}"))
                if exp._guard.should_stop:
                    break
            exp.flush_logs()  # epoch boundary: sync queued step metrics
            if exp.preempted(state):
                break
            if step_host == step_at_epoch_start:
                print(f"[{cfg.name}] epoch {epoch + 1}: no trainable batch; stopping")
                break
            metrics, _ = validate(embed_fn, state.params, exp.val_feats,
                                  exp.val_labels, beat=exp.beat_fn)
            exp.log(step_host, metrics,
                    f"[{cfg.name}] epoch {epoch + 1} val mAP "
                    f"{metrics['val_mAP']:.4f}")
            exp.ckpt.save_async(state, step_host)
            epoch = epoch_of_step(step_host, exp.batch_per_epoch)

    finally:
        # cancel the prefetch worker (it runs one batch ahead)
        # and flush any open trace/logs even when a step raises
        stream.close()
        exp.close()
    return state, metrics, exp.result_dir


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
