"""Unimodal triplet baseline trainer.

Reference: src/base_model.py:87-323 (FaceNet-style semi-hard triplet
training over hierarchically sampled sessions).  TPU-first rework: the
embed-all / host-mine / re-forward triangle is one jitted step
(train/steps.py); the session loader feeds fixed-shape padded batches.

Run:  python -m multimodal_similarity_tpu.train.trainers.base_model \
          --DATA_ROOT ... --network convrtsn --triplet_select facenet ...
"""

from __future__ import annotations

import functools
import random
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.data import (
    SessionBatchLoader,
    load_validation_set,
    prepare_dataset,
    tsn_prepare_input,
    tsn_prepare_input_test,
)
from multimodal_similarity_tpu.models import build_encoder
from multimodal_similarity_tpu.ops.mining import select_triplets_random
from multimodal_similarity_tpu.train.checkpoints import CheckpointManager
from multimodal_similarity_tpu.train.state import (
    TrainState,
    build_optimizer,
    learning_rate_schedule,
)
from multimodal_similarity_tpu.train.steps import (
    make_embed_fn,
    make_gathered_triplet_step,
    make_triplet_train_step,
)
from multimodal_similarity_tpu.train.trainer import (
    epoch_of_step,
    setup_experiment,
    validate,
)
from multimodal_similarity_tpu.utils.logging import (
    MetricsLogger,
    write_projector_config,
    write_projector_embedding,
    write_projector_metadata,
)


def train(cfg: TrainConfig, event_budget: Optional[int] = None,
          result_dir: Optional[str] = None):
    """Returns (final TrainState, final val metrics dict, result_dir).

    With ``--multihost`` (+ explicit coordinator flags, or a pod
    environment that provides them): jax.distributed bootstrap, training
    sessions sharded across hosts, per-host loaders feeding globally
    sharded batches over a mesh spanning every process's devices, and the
    same fused data-parallel step (labels/mask fed host-local and gathered
    on device).  Only process 0 writes checkpoints/projector files."""
    pid, pcount = 0, 1
    if cfg.multihost:
        import dataclasses

        from multimodal_similarity_tpu.parallel.multihost import (
            initialize_distributed)
        initialize_distributed(
            cfg.coordinator_address or None,
            cfg.num_processes or None,
            cfg.process_id if cfg.process_id >= 0 else None)
        pid, pcount = jax.process_index(), jax.process_count()
        if cfg.triplet_select != "facenet":
            raise NotImplementedError(
                "--multihost requires --triplet_select facenet (the fused "
                "device-mining step; host miners are single-process)")
        if pid > 0:
            # per-host result scratch: process 0 owns the real artifacts
            cfg = dataclasses.replace(cfg, name=f"{cfg.name}_proc{pid}")
            if result_dir is not None:
                result_dir = f"{result_dir}_proc{pid}"
    result_dir = setup_experiment(cfg, result_dir=result_dir)
    logger = MetricsLogger(result_dir)
    event_budget = event_budget or cfg.event_per_batch
    # round the (mask-padded, fixed-shape) event budget up to a device
    # multiple so multi-device runs never silently fall back to one chip
    mesh = None
    if cfg.triplet_select == "facenet":
        if cfg.model_parallel > 1:
            # dp x tp: batch on "data", wide weight-matrix columns on
            # "model" (parallel/tensor_parallel.py); XLA SPMD inserts the
            # ICI collectives where activations rejoin.  Composes with
            # --multihost: tp groups stay within a host (auto_mesh_tp
            # validates), the data axis aligns to processes, and
            # shard_state_tp contributes each host's columns via
            # make_array_from_process_local_data
            from multimodal_similarity_tpu.parallel import auto_mesh_tp
            mesh, event_budget = auto_mesh_tp(
                event_budget, cfg.model_parallel,
                verbose=not cfg.silent_mode)
        else:
            from multimodal_similarity_tpu.parallel import auto_mesh
            mesh, event_budget = auto_mesh(event_budget,
                                           verbose=not cfg.silent_mode)
    elif cfg.model_parallel > 1:
        raise ValueError("--model_parallel requires --triplet_select "
                         "facenet (the jitted device step)")
    if cfg.multihost and mesh is None:
        raise RuntimeError("--multihost needs >= 2 devices across processes")

    feat = cfg.feat if isinstance(cfg.feat, str) else cfg.feat[0]
    train_set = prepare_dataset(cfg.feature_root, cfg.train_session, feat,
                                cfg.label_root, cfg.label_type)
    train_set = train_set[: cfg.label_num]
    val_set = prepare_dataset(cfg.feature_root, cfg.val_session, feat,
                              cfg.label_root, cfg.label_type)

    # multihost: each host loads only its session shard and its slice of
    # the (device-rounded) event budget; every host runs the same number
    # of steps per epoch so the collectives stay in lockstep
    local_set, local_budget = train_set, event_budget
    if pcount > 1:
        from multimodal_similarity_tpu.parallel.multihost import (
            host_local_sessions)
        local_set = host_local_sessions(train_set, pid, pcount)
        local_budget = event_budget // pcount
        batch_per_epoch = (len(train_set) // pcount) // cfg.sess_per_batch

    if pcount == 1:
        batch_per_epoch = len(local_set) // cfg.sess_per_batch
    # guard BEFORE constructing the loader: an empty/short session shard
    # must fail with this message, not the loader's internals
    if batch_per_epoch < 1 or not local_set:
        raise ValueError(
            f"{len(train_set)} train sessions < sess_per_batch="
            f"{cfg.sess_per_batch}"
            + (f" x {pcount} processes" if pcount > 1 else "")
            + "; nothing to iterate")
    loader = SessionBatchLoader(
        local_set, sess_per_batch=cfg.sess_per_batch,
        event_budget=local_budget,
        prepare_funcs=[functools.partial(tsn_prepare_input, cfg.num_seg)],
        seed=cfg.seed + pid)

    val_feats, val_labels, val_sess, val_bound = load_validation_set(
        val_set, functools.partial(tsn_prepare_input_test, cfg.num_seg))
    write_projector_metadata(result_dir, val_labels, val_sess, val_bound)

    model = build_encoder(cfg.network, num_seg=cfg.num_seg,
                          emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                          n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C,
                          keep_prob=cfg.keep_prob)
    rng = jax.random.PRNGKey(cfg.seed)
    variables = model.init(rng, jnp.asarray(
        np.zeros((2,) + val_feats.shape[1:], np.float32)))
    tx = build_optimizer(cfg.optimizer, cfg.learning_rate)
    state = TrainState.create(variables["params"], tx)

    ckpt = CheckpointManager(result_dir, cfg.name)
    if cfg.model_path:
        from multimodal_similarity_tpu.train.checkpoints import load_pytree
        state = load_pytree(cfg.model_path, state)

    embed_fn = make_embed_fn(model, cfg.normalized)
    # data-parallel over every visible device: batch sharded on the mesh,
    # embeddings all-gathered over ICI for global mining, grads psum'd
    # (the event budget was already rounded up to a device multiple above)
    if mesh is not None:
        from multimodal_similarity_tpu.parallel import make_dp_triplet_step
        if cfg.model_parallel > 1:
            # column-shard params + optimizer moments over "model"; the
            # step takes the state with in_shardings=None, so SPMD runs
            # every wide matmul column-parallel from these placements.
            # Assert something actually sharded: a config whose dims
            # don't divide would otherwise run an all-replicated "tp"
            # no-op silently.
            from multimodal_similarity_tpu.parallel import (
                shard_state_tp, tp_sharded_leaves)
            sharded = tp_sharded_leaves(state.params, mesh)
            if not sharded:
                raise ValueError(
                    f"--model_parallel {cfg.model_parallel}: no parameter "
                    f"has a trailing dim divisible by {cfg.model_parallel} "
                    f"(emb_dim {cfg.emb_dim}); tensor parallelism would "
                    "be a silent no-op")
            state = shard_state_tp(state, mesh)
            if not cfg.silent_mode:
                print(f"[{cfg.name}] tensor-parallel: {len(sharded)} "
                      f"weight tensors column-sharded over "
                      f"{cfg.model_parallel} chips")
        elif pcount == 1:
            state = jax.device_put(state, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))
        # multihost: the state stays an uncommitted host-local value
        # (identical on every process, same seed); jit replicates it —
        # device_put cannot address other hosts' devices
        step_fn = make_dp_triplet_step(
            model, mesh, triplet_per_batch=cfg.triplet_per_batch,
            alpha=cfg.alpha, num_negative=cfg.num_negative,
            metric=cfg.metric, normalized=cfg.normalized,
            lambda_l2=cfg.lambda_l2, gather_smalls=pcount > 1)
        if not cfg.silent_mode:
            print(f"[{cfg.name}] data-parallel over "
                  f"{mesh.shape['data']} devices"
                  + (f" x {cfg.model_parallel} model-parallel"
                     if cfg.model_parallel > 1 else "")
                  + (f" on {pcount} hosts" if pcount > 1 else ""))
    elif cfg.triplet_select == "facenet":
        step_fn = make_triplet_train_step(
            model, triplet_per_batch=cfg.triplet_per_batch, alpha=cfg.alpha,
            num_negative=cfg.num_negative, metric=cfg.metric,
            normalized=cfg.normalized, lambda_l2=cfg.lambda_l2)
    elif cfg.triplet_select in ("random", "facenet_host"):
        # facenet_host: the reference's exact host-side semi-hard miner
        # (utils.py:430-496) feeding a gathered-triplet step — the
        # semantics-parity mode for A/B against the fused device miner
        step_fn = make_gathered_triplet_step(
            model, alpha=cfg.alpha, normalized=cfg.normalized,
            lambda_l2=cfg.lambda_l2)
    else:
        raise NotImplementedError(cfg.triplet_select)

    from multimodal_similarity_tpu.train.trainer import feature_caster
    _cast = feature_caster(cfg)
    # (int8 x bf16 exclusion is validated in TrainConfig.resolve)
    if cfg.int8_features and cfg.triplet_select != "facenet":
        raise ValueError("--int8_features requires the device-fed "
                         "path (--triplet_select facenet); host "
                         "miners slice raw numpy features")

    # --device_cache: upload the train set ONCE as int8 windows; every
    # epoch's TSN re-sampling becomes an on-device gather and the link
    # carries only the tiny index/label/mask plan (data/device_cache.py).
    # Falls back to the streaming feed when the estimate exceeds
    # --device_cache_gb.
    cache = None
    if cfg.device_cache:
        if cfg.triplet_select != "facenet":
            raise ValueError("--device_cache requires --triplet_select "
                             "facenet (the device-fed fused step)")
        if cfg.bf16_features:
            raise ValueError("--device_cache stores int8; it excludes "
                             "--bf16_features")
        from multimodal_similarity_tpu.data.device_cache import (
            DeviceFeatureCache, cache_budget_bytes)
        # --multihost: the cache computes the GLOBAL layout from the full
        # session list (sessions round-robin over the mesh's "data"
        # shards, replacing host_local_sessions' host split) and each
        # process loads + uploads only its own shards' features; plans,
        # labels, and step counts stay identical on every host, so the
        # fused cached step runs in lockstep exactly like the streamed
        # multihost feed
        cache = DeviceFeatureCache.build(
            train_set if pcount > 1 else local_set, n_seg=cfg.num_seg,
            sess_per_batch=cfg.sess_per_batch,
            event_budget=event_budget, seed=cfg.seed, mesh=mesh,
            budget_bytes=cache_budget_bytes(cfg.device_cache_gb),
            verbose=not cfg.silent_mode)
        if cache is not None:
            batch_per_epoch = cache.batches_per_epoch
            # single-dispatch path: the TSN gather runs INSIDE the train
            # program; a batch costs one packed KB-scale upload
            from multimodal_similarity_tpu.train.cached_steps import (
                make_cached_triplet_step)
            cached_step = make_cached_triplet_step(
                model, cache, triplet_per_batch=cfg.triplet_per_batch,
                alpha=cfg.alpha, num_negative=cfg.num_negative,
                metric=cfg.metric, normalized=cfg.normalized,
                lambda_l2=cfg.lambda_l2)
            cache_ops = cache.step_operands()
            multi_cached = None
            if cfg.steps_per_dispatch > 1:
                # --steps_per_dispatch: K whole optimizer steps per
                # program (lax.scan over the fused body); full windows
                # ride multi_cached, the epoch tail the K=1 step
                multi_cached = make_cached_triplet_step(
                    model, cache, triplet_per_batch=cfg.triplet_per_batch,
                    alpha=cfg.alpha, num_negative=cfg.num_negative,
                    metric=cfg.metric, normalized=cfg.normalized,
                    lambda_l2=cfg.lambda_l2,
                    steps_per_dispatch=cfg.steps_per_dispatch)
                from multimodal_similarity_tpu.data.device_cache import (
                    notice_window_shortfall)
                notice_window_shortfall(cache, cfg.steps_per_dispatch,
                                        cfg.name, cfg.silent_mode)

    # fused-step path: events/labels/mask are device_put (with the bf16
    # cast host-side) on a background thread one batch ahead, so the
    # ~GB-scale feature upload overlaps the previous step instead of
    # serializing with it (the reference pays this serialization on every
    # feed_dict, base_model.py:284-287).  The stream is CONTINUOUS across
    # epochs: the next epoch's first batch loads/uploads during the
    # epoch-boundary validation + checkpoint, so no step ever waits on
    # the pipeline fill after the very first one (the loader's shuffle
    # rng advances exactly as per-epoch calls would — same batch order).
    # The epoch loop slices batch_per_epoch batches per epoch; the while
    # condition owns termination, and the stream is closed on exit
    # (cancels the worker thread).
    def continuous_batches():
        def epochs():
            while True:
                produced = 0
                # lockstep truncation (pcount > 1): every host dispatches
                # the same number of collective steps per epoch; truncated
                # INSIDE the loader so its rng consumption stays
                # deterministic (no prefetched-then-dropped batches)
                batches = loader.epoch(
                    max_batches=batch_per_epoch if pcount > 1 else None)
                for b in batches:
                    produced += 1
                    yield b
                if not produced:  # empty epoch: let the consumer stop
                    return

        if cache is not None:
            # device-resident cache: host side carries only the packed
            # index plan; the fused step gathers + trains in one program
            def cached_epochs():
                while True:
                    yield from cache.epoch_plans()
            return cached_epochs()
        if cfg.triplet_select != "facenet":
            return epochs()  # host miners need host-resident arrays
        from multimodal_similarity_tpu.data import (
            device_prefetch, feed_shardings)
        shardings = None
        if mesh is not None and pcount > 1:
            # each host feeds only its local rows; labels/mask ride the
            # batch axis too and the step gathers them for global mining
            shardings = feed_shardings(
                mesh, data_keys=("events", "labels", "mask"),
                replicated_keys=())
        elif mesh is not None:
            shardings = feed_shardings(mesh, data_keys=("events",),
                                       replicated_keys=("labels", "mask"))
        return device_prefetch(
            epochs(), device_keys=("events", "labels", "mask"),
            bf16_keys=("events",) if cfg.bf16_features else (),
            int8_keys=("events",) if cfg.int8_features else (),
            shardings=shardings)

    metrics = {}
    # host-side miners draw from a config-seeded stream, independent of
    # process-global RNG state (keeps host-vs-device A/B runs repeatable)
    mine_rng = random.Random(cfg.seed)
    # host-side step counter + deferred metrics readback: a per-step
    # float()/int(state.step) blocks until the device returns the step,
    # which on a high-latency link serializes dispatch (one RTT per step
    # on top of compute).  Scalars queue in DeferredStepLogs and read
    # back every --log_flush_every steps; every step is still logged.
    step_host = int(state.step)
    epoch = epoch_of_step(step_host, batch_per_epoch)
    from multimodal_similarity_tpu.utils.logging import DeferredStepLogs
    deferred = DeferredStepLogs(logger, flush_every=cfg.log_flush_every,
                                echo=not cfg.silent_mode)
    from multimodal_similarity_tpu.utils.profiling import StepWindowProfiler
    profiler = StepWindowProfiler(cfg.profile_dir if pid == 0 else "",
                                  num_steps=cfg.profile_steps)
    import itertools
    from multimodal_similarity_tpu.utils.preemption import (
        PreemptionGuard, report_preemption, sync_should_stop)
    stream = continuous_batches()
    guard = PreemptionGuard().install()
    # --watchdog_secs: hang detection; fires -> guard stop -> the loop's
    # existing preemption epilogue checkpoints the exact step
    from multimodal_similarity_tpu.utils.watchdog import install_hang_watchdog
    watchdog = install_hang_watchdog(cfg.name, cfg.watchdog_secs, guard)
    stopping = False
    try:
        while epoch < cfg.max_epochs:
            lr = learning_rate_schedule(epoch, cfg.learning_rate,
                                        cfg.static_epochs, cfg.max_epochs)
            step_at_epoch_start = step_host
            batch_iter = itertools.islice(stream, batch_per_epoch)
            if cache is not None and cfg.steps_per_dispatch > 1:
                # windowed multi-step dispatch: K stacked KB-scale plans,
                # ONE dispatch RPC per K optimizer steps (the measured
                # governing per-step cost on a high-latency link); the
                # epoch-tail remainder rides the K=1 fused step so no
                # batch is dropped.  Falls through to the same epoch
                # epilogue as the per-batch loop.
                from multimodal_similarity_tpu.train.cached_steps import (
                    dispatch_plan_window)
                K = cfg.steps_per_dispatch
                for win in iter(
                        lambda: list(itertools.islice(batch_iter, K)), []):
                    t0 = time.time()
                    keys = []
                    for _ in win:
                        rng, k_step = jax.random.split(rng)
                        keys.append(k_step)
                    state, aux_list = dispatch_plan_window(
                        state, win, keys, lr, fused=cached_step,
                        multi=multi_cached, k=K,
                        plan_args=lambda p: (p["packed"],),
                        cache_ops=cache_ops, put_plans=cache.put_plans)
                    dt = (time.time() - t0) / len(win)
                    for aux in aux_list:
                        step_host += 1
                        profiler.update(step_host)
                        deferred.append(
                            step_host, aux,
                            {"train_time": dt, "learning_rate": lr},
                            echo_fn=lambda sc, e=epoch, s=step_host: (
                                f"[{cfg.name}] epoch {e + 1} step {s} "
                                f"loss {sc['loss']:.4f} "
                                f"triplets {sc['triplet_num']:.0f} "
                                f"({sc['train_time']:.2f}s)"))
                    if watchdog is not None:
                        watchdog.beat()
                    stopping = sync_should_stop(guard, pcount,
                                                step=step_host)
                    if stopping:
                        break
                batch_iter = iter(())  # fully consumed (or stopped) above
            for batch in batch_iter:
                t0 = time.time()
                rng, key = jax.random.split(rng)
                if cfg.triplet_select == "facenet" and cache is not None:
                    # fused gather+train: one program, one packed upload
                    # (put_plans: global plan array under --multihost)
                    state, aux = cached_step(
                        state, *cache.put_plans((batch["packed"],)), key,
                        jnp.float32(lr), *cache_ops)
                elif cfg.triplet_select == "facenet":
                    # events/labels/mask arrive device-resident (and bf16-cast
                    # when requested) from the prefetch thread
                    if mesh is not None:
                        if pcount > 1:
                            # uncommitted identical-per-host scalars: jit
                            # replicates them per in_shardings (device_put
                            # cannot address other hosts' devices)
                            key_b, lr_b = key, jnp.float32(lr)
                        else:
                            from multimodal_similarity_tpu.parallel import (
                                replicate)
                            key_b, lr_b = replicate((key, jnp.float32(lr)),
                                                    mesh)
                        state, aux = step_fn(state, batch["events"],
                                             batch["labels"], batch["mask"],
                                             key_b, lr_b)
                    else:
                        state, aux = step_fn(
                            state, batch["events"], batch["labels"],
                            batch["mask"], key, jnp.float32(lr))
                else:
                    events = jnp.asarray(_cast(batch["events"]))
                    n = int(batch["num_events"])
                    if cfg.triplet_select == "facenet_host":
                        from multimodal_similarity_tpu.ops.distances import (
                            all_diffs, cdist)
                        from multimodal_similarity_tpu.ops.mining import (
                            select_triplets_facenet)
                        from multimodal_similarity_tpu.train.steps import (
                            embed_in_chunks)
                        emb = embed_in_chunks(
                            embed_fn, state.params, batch["events"][:n],
                            beat=watchdog.beat if watchdog is not None
                            else None)
                        dists = np.asarray(cdist(all_diffs(
                            jnp.asarray(emb), jnp.asarray(emb)), cfg.metric))
                        idx, _ = select_triplets_facenet(
                            batch["labels"][:n], dists, cfg.triplet_per_batch,
                            cfg.alpha, cfg.num_negative, rng=mine_rng)
                    else:
                        idx = select_triplets_random(batch["labels"][:n],
                                                     cfg.triplet_per_batch,
                                                     cfg.num_negative,
                                                     rng=mine_rng)
                    if not idx:
                        continue
                    t_cap = cfg.triplet_per_batch
                    tri = np.zeros(3 * t_cap, np.int32)
                    tri_mask = np.zeros(t_cap, np.float32)
                    m = min(len(idx) // 3, t_cap)
                    arr = np.asarray(idx[: 3 * m], np.int32).reshape(-1, 3)
                    tri[:m] = arr[:, 0]
                    tri[t_cap:t_cap + m] = arr[:, 1]
                    tri[2 * t_cap:2 * t_cap + m] = arr[:, 2]
                    tri_mask[:m] = 1.0
                    state, aux = step_fn(state, events, jnp.asarray(tri),
                                         jnp.asarray(tri_mask), key,
                                         jnp.float32(lr))
                step_host += 1
                profiler.update(step_host)
                # train_time is the host dispatch interval: with deferred
                # readback the loop no longer waits for the device, so
                # per-step device time shows up in the flush cadence
                deferred.append(
                    step_host, aux,
                    {"train_time": time.time() - t0, "learning_rate": lr},
                    echo_fn=lambda sc, e=epoch, s=step_host: (
                        f"[{cfg.name}] epoch {e + 1} step {s} "
                        f"loss {sc['loss']:.4f} "
                        f"triplets {sc['triplet_num']:.0f} "
                        f"({sc['train_time']:.2f}s)"))
                if watchdog is not None:
                    # dispatch progress; a wedged device stalls the
                    # periodic flush, the beats stop, the watchdog fires
                    watchdog.beat()
                # collective: a SIGTERM on ANY host stops every host at
                # this same step boundary (a lone exiter would leave its
                # peers blocked in the next collective)
                stopping = sync_should_stop(guard, pcount,
                                            step=step_host)
                if stopping:
                    break

            deferred.flush()  # epoch boundary: sync queued step metrics
            # epoch boundary: force a sync so a signal near epoch end
            # isn't deferred into the next epoch by the step throttle
            stopping = stopping or sync_should_stop(guard, pcount)
            if stopping:
                # preemption (SIGTERM grace window): checkpoint the exact
                # step and exit cleanly; --model_path on this file resumes
                # from here (epoch_of_step re-derives the epoch)
                report_preemption(cfg.name, state, ckpt, pid)
                break
            if step_host == step_at_epoch_start:
                print(f"[{cfg.name}] epoch {epoch + 1}: no trainable batch; stopping")
                break
            val_params = state.params
            if pcount > 1:
                # replicated global arrays -> host-local values for the
                # (host-side, redundant-per-host) validation pass
                val_params = jax.tree.map(
                    lambda a: np.asarray(jax.device_get(a)), state.params)
            metrics, val_emb = validate(
                embed_fn, val_params, val_feats, val_labels,
                beat=watchdog.beat if watchdog is not None else None)
            logger.log(step_host, metrics)
            if pid == 0:
                # per-epoch embedding-projector refresh (base_model.py:316-320)
                write_projector_embedding(result_dir, np.asarray(val_emb))
                write_projector_config(result_dir)
            if not cfg.silent_mode:
                print(f"[{cfg.name}] epoch {epoch + 1} "
                      f"val mAP {metrics['val_mAP']:.4f} "
                      f"R@1 {metrics['val_recall@1']:.4f}")
            if pid == 0:
                ckpt.save_async(state, step_host)
            epoch = epoch_of_step(step_host, batch_per_epoch)

    finally:
        # cancel the prefetch worker (it runs one batch ahead)
        # and flush any open trace/logs even when a step raises
        deferred.close()  # best-effort on the crash path
        if watchdog is not None:
            watchdog.cancel()
        guard.restore()
        stream.close()
        profiler.close()
        logger.close()
        # LAST: a failed async checkpoint write must raise only after the
        # watchdog/signal-handler/prefetch cleanup has run
        ckpt.wait()
    return state, metrics, result_dir


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
