"""Shared scaffolding for the Honda-track trainers.

Factors the boilerplate every reference trainer repeats (dataset prep,
session loader, validation preload, result dir, logging, checkpointing —
e.g. base_model.py:87-211) so each experiment module only defines its
models, its jitted step, and its mining policy.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.data import (
    SessionBatchLoader,
    load_validation_set,
    prepare_dataset,
    prepare_multimodal_dataset,
    tsn_prepare_input,
    tsn_prepare_input_test,
)
from multimodal_similarity_tpu.train.checkpoints import CheckpointManager
from multimodal_similarity_tpu.train.trainer import setup_experiment
from multimodal_similarity_tpu.utils.logging import (
    MetricsLogger,
    write_projector_metadata,
)


class HondaExperiment:
    """Loaders + validation arrays + bookkeeping for one experiment run."""

    def __init__(self, cfg: TrainConfig, *, modalities: Optional[List[str]] = None,
                 event_budget: Optional[int] = None,
                 result_dir: Optional[str] = None,
                 limit_label_num: bool = True,
                 val_sessions: Optional[Sequence[str]] = None,
                 session_shard: Optional[Sequence[int]] = None,
                 supports_int8: bool = False):
        self.cfg = cfg
        # --int8_features only works on trainers that feed through
        # device_prefetch AND dequantize in their step; everywhere else it
        # must fail loudly instead of silently shipping f32
        if getattr(cfg, "int8_features", False) and not supports_int8:
            raise ValueError(
                "--int8_features is not supported by this trainer (it "
                "requires a device-fed step that dequantizes inline); "
                "supported: base_model (facenet), base_model_batchhard, "
                "multimodal_model --device_mining")
        self.result_dir = setup_experiment(cfg, result_dir=result_dir)
        self.logger = MetricsLogger(self.result_dir)
        self.ckpt = CheckpointManager(self.result_dir, cfg.name)
        event_budget = event_budget or cfg.event_per_batch

        if modalities is None:
            feat = cfg.feat if isinstance(cfg.feat, str) else cfg.feat[0]
            modalities = [feat]
        self.modalities = modalities

        prep_train = functools.partial(tsn_prepare_input, cfg.num_seg)
        prep_test = functools.partial(tsn_prepare_input_test, cfg.num_seg)

        if len(modalities) == 1:
            train_set = prepare_dataset(cfg.feature_root, cfg.train_session,
                                        modalities[0], cfg.label_root,
                                        cfg.label_type)
        else:
            train_set = prepare_multimodal_dataset(
                cfg.feature_root, cfg.train_session, modalities,
                cfg.label_root, cfg.label_type)
        if limit_label_num:
            train_set = train_set[: cfg.label_num]
        self.train_set = train_set
        self.labeled_sessions = set(cfg.train_session[: cfg.label_num])

        self.event_budget = event_budget

        # multihost: this process loads only its session shard, but the
        # per-epoch step count stays GLOBAL-lockstep (every host must
        # dispatch the same number of collective steps per epoch)
        local_set = train_set
        lockstep_bpe = None
        if session_shard is not None:
            pid, pcount = session_shard
            from multimodal_similarity_tpu.parallel.multihost import (
                host_local_sessions)
            local_set = host_local_sessions(train_set, pid, pcount)
            lockstep_bpe = (len(train_set) // pcount) // cfg.sess_per_batch

        # guard BEFORE constructing the loader: an empty/short session
        # shard must fail with this message, not the loader's internals
        self.batch_per_epoch = (lockstep_bpe if lockstep_bpe is not None
                                else len(local_set) // cfg.sess_per_batch)
        if self.batch_per_epoch < 1 or not local_set:
            raise ValueError(
                f"{len(train_set)} train sessions < sess_per_batch="
                f"{cfg.sess_per_batch}"
                + (f" x {session_shard[1]} processes"
                   if session_shard is not None else ""))
        self.local_set = local_set
        self.loader = SessionBatchLoader(
            local_set, sess_per_batch=cfg.sess_per_batch,
            event_budget=event_budget,
            prepare_funcs=[prep_train] * len(modalities), seed=cfg.seed)

        val_ids = list(val_sessions or cfg.val_session)
        if len(modalities) == 1:
            val_set = prepare_dataset(cfg.feature_root, val_ids,
                                      modalities[0], cfg.label_root,
                                      cfg.label_type)
            self.val_feats, self.val_labels, val_sess, val_bound = \
                load_validation_set(val_set, prep_test)
            self.val_extra = []
        else:
            val_set = prepare_multimodal_dataset(
                cfg.feature_root, val_ids, modalities, cfg.label_root,
                cfg.label_type)
            self.val_feats, self.val_labels, val_sess, val_bound = \
                load_validation_set([[r[0], r[-1]] for r in val_set],
                                    prep_test)
            self.val_extra = []
            for m in range(1, len(modalities)):
                feats_m, _, _, _ = load_validation_set(
                    [[r[m], r[-1]] for r in val_set], prep_test)
                self.val_extra.append(feats_m)

        write_projector_metadata(self.result_dir, self.val_labels, val_sess,
                                 val_bound)
        self.rng = jax.random.PRNGKey(cfg.seed)

        # --profile_dir: every HondaExperiment trainer gets the jax.profiler
        # step-window trace through exp.log (process 0 only on a pod)
        from multimodal_similarity_tpu.utils.profiling import (
            StepWindowProfiler)
        pid = session_shard[0] if session_shard is not None else 0
        self.profiler = StepWindowProfiler(
            cfg.profile_dir if pid == 0 else "",
            num_steps=cfg.profile_steps)
        # SIGTERM-grace preemption guard shared by every loop trainer
        # built on this scaffolding (restored in close())
        from multimodal_similarity_tpu.utils.preemption import PreemptionGuard
        self._guard = PreemptionGuard().install()
        self._pid, self._pcount = (session_shard if session_shard is not None
                                   else (0, 1))
        # --watchdog_secs: per-step hang detection (SURVEY.md §5 failure
        # detection).  Heartbeat model: exp.log's scalar readback beats the
        # timer, so the armed window covers step dispatch + device
        # execution + readback + the loader wait.  On expiry: dump every
        # thread's traceback (the wedged RPC / stuck loader is visible in
        # it) and request a preemption-style stop so the loop checkpoints
        # the exact step at its next boundary — if the step eventually
        # returns, no work is lost; if it never returns, the traceback is
        # the diagnostic the reference could never produce.  Set the
        # timeout above the first step's compile time.
        from multimodal_similarity_tpu.utils.watchdog import (
            install_hang_watchdog)
        self.watchdog = install_hang_watchdog(
            cfg.name, getattr(cfg, "watchdog_secs", 0.0), self._guard)
        self._deferred = None  # lazy DeferredStepLogs (log_deferred)

    def next_key(self):
        self.rng, key = jax.random.split(self.rng)
        return key

    @property
    def beat_fn(self):
        """Heartbeat callable for long epoch-boundary device passes
        (validation / val-embed chunks), or None when no watchdog is
        armed — each embedded chunk is real progress, so a big val set
        must not trip a step-sized hang deadline."""
        return self.watchdog.beat if self.watchdog is not None else None

    # -- device-resident epoch feature cache ---------------------------------

    def build_cache(self, modality_modes=None, mesh=None):
        """``--device_cache`` for any HondaExperiment trainer: upload this
        experiment's (possibly multimodal) train windows ONCE as int8 and
        re-sample TSN segments on device each epoch
        (data/device_cache.py).  Returns the cache — updating
        ``batch_per_epoch`` (and ``event_budget``, if device-rounding
        grew it) to the cache's plan — or None (over the
        ``--device_cache_gb`` budget, or the flag is off): callers keep
        the streaming loader.

        Sharding: with no ``mesh`` given, a single-process run builds a
        local "data" mesh over every visible device (parallel.auto_mesh)
        so the cache shards its rows and gathers shard-locally — the same
        layout base_model/the flagship use.  Under ``--multihost`` the
        caller must pass its GLOBAL mesh; the cache then computes the
        global layout on every host from label pickles and each process
        uploads only its own shards' features
        (data/device_cache.DeviceFeatureCache._upload).
        """
        cfg = self.cfg
        if not getattr(cfg, "device_cache", False):
            return None
        if getattr(cfg, "bf16_features", False):
            raise ValueError("--device_cache stores int8; it excludes "
                             "--bf16_features")
        from multimodal_similarity_tpu.data.device_cache import (
            DeviceFeatureCache, cache_budget_bytes)
        dataset = self.local_set
        budget = self.event_budget
        if self._pcount > 1:
            if mesh is None:
                raise ValueError(
                    "--device_cache under --multihost needs the trainer's "
                    "global mesh passed to build_cache")
            # global layout from the FULL session list (each host loads
            # only its own shards' features); the experiment's budget was
            # divided per host — the cache plans globally
            dataset = self.train_set
            budget = self.event_budget * self._pcount
        elif mesh is None:
            from multimodal_similarity_tpu.parallel import auto_mesh
            mesh, budget = auto_mesh(budget, verbose=not cfg.silent_mode)
        cache = DeviceFeatureCache.build(
            dataset, n_seg=cfg.num_seg,
            sess_per_batch=cfg.sess_per_batch,
            event_budget=budget, seed=cfg.seed, mesh=mesh,
            budget_bytes=cache_budget_bytes(cfg.device_cache_gb),
            modality_modes=modality_modes, beat=self.beat_fn,
            verbose=not cfg.silent_mode)
        if cache is None and mesh is not None and self._pcount == 1:
            # the sharded build declined (fewer sessions than shards, or
            # the shard-padding pushed the estimate over budget): a
            # single-device cache may still fit — better than losing the
            # cache entirely
            if not cfg.silent_mode:
                print(f"[{cfg.name}] sharded cache declined; retrying "
                      "unsharded")
            mesh, budget = None, self.event_budget
            cache = DeviceFeatureCache.build(
                dataset, n_seg=cfg.num_seg,
                sess_per_batch=cfg.sess_per_batch,
                event_budget=budget, seed=cfg.seed, mesh=None,
                budget_bytes=cache_budget_bytes(cfg.device_cache_gb),
                modality_modes=modality_modes, beat=self.beat_fn,
                verbose=not cfg.silent_mode)
        if cache is not None:
            self.batch_per_epoch = cache.batches_per_epoch
            if self._pcount == 1:
                # single-process: adopt the device-rounded budget.  Under
                # --multihost, `budget` is the GLOBAL figure the cache
                # plans with (cache.event_budget); self.event_budget
                # keeps its per-host meaning for everything else
                self.event_budget = budget
        return cache

    def cached_programs(self, cache, body):
        """Build the fused gather+train program(s) for ``body``
        (train/cached_steps.make_cached_body_step): the K=1 step, the
        ``--steps_per_dispatch`` scanned program (or None), and the
        cache's resident step operands."""
        from multimodal_similarity_tpu.data.device_cache import (
            notice_window_shortfall)
        from multimodal_similarity_tpu.train.cached_steps import (
            make_cached_body_step)
        fused = make_cached_body_step(body, cache)
        multi = None
        k = getattr(self.cfg, "steps_per_dispatch", 1)
        if k > 1:
            multi = make_cached_body_step(body, cache, steps_per_dispatch=k)
            notice_window_shortfall(cache, k, self.cfg.name,
                                    self.cfg.silent_mode)
        return fused, multi, cache.step_operands()

    def run_cached_epoch(self, cache, state, *, fused, multi, cache_ops,
                         lr, step_host: int, epoch: int, echo=None):
        """One epoch from the cache's KB-scale index plans through the
        fused gather+train program: full ``--steps_per_dispatch`` windows
        ride the scanned program (one dispatch RPC per K optimizer
        steps), the epoch tail the K=1 step.  Metrics queue through
        ``log_deferred`` (no per-step device readback); watchdog beats on
        every dispatch; stop polls at window boundaries.  Returns
        ``(state, step_host, stopped)`` — ``step_host`` is the
        authoritative host-side step counter (reading ``state.step``
        would force the sync this path exists to avoid).  The final
        step's (device-resident) scalars are kept on
        ``self.last_cached_aux`` for trainers that report a last-batch
        metric; read it AFTER this returns (the epoch flush has synced)."""
        import itertools
        import time

        from multimodal_similarity_tpu.utils.preemption import (
            sync_should_stop)

        cfg = self.cfg
        k = getattr(cfg, "steps_per_dispatch", 1)
        stopped = False
        plan_iter = iter(cache.epoch_plans())

        def emit(aux_list, dt, first_step):
            s = first_step
            for aux in aux_list:
                s += 1
                self.last_cached_aux = aux
                self.log_deferred(
                    s, aux, {"train_time": dt, "learning_rate": lr},
                    echo_fn=(None if echo is None else
                             (lambda sc, st=s: echo(epoch, st, sc))))
            return s

        from multimodal_similarity_tpu.train.cached_steps import (
            dispatch_plan_window)
        window = k if multi is not None else 1
        for win in iter(
                lambda: list(itertools.islice(plan_iter, window)), []):
            t0 = time.time()
            state, aux_list = dispatch_plan_window(
                state, win, [self.next_key() for _ in win], lr,
                fused=fused, multi=multi, k=k,
                plan_args=lambda p: (p["packed"],), cache_ops=cache_ops,
                put_plans=cache.put_plans)
            dt = (time.time() - t0) / len(win)
            step_host = emit(aux_list, dt, step_host)
            stopped = sync_should_stop(self._guard, self._pcount,
                                       step=step_host)
            if stopped:
                break
        self.flush_logs()  # epoch boundary: sync queued step metrics
        return state, step_host, stopped

    def log(self, step: int, scalars, echo: str = ""):
        self.flush_logs()  # keep the JSONL stream step-ordered
        self.profiler.update(step)
        if self.watchdog is not None:
            self.watchdog.beat()  # progress: reset the hang deadline
        self.logger.log(step, {k: float(v) for k, v in scalars.items()})
        if echo and not self.cfg.silent_mode:
            print(echo)

    def log_deferred(self, step: int, device_scalars, host_scalars=None,
                     echo_fn=None):
        """exp.log WITHOUT the per-step device->host readback.

        Queues the step's device scalars (utils/logging.DeferredStepLogs)
        so the loop can enqueue the next step immediately — on a
        high-latency link the synchronous float() otherwise costs one RTT
        per step on top of compute.  Every step is still logged exactly.

        Watchdog interaction: beats fire on every append (host dispatch
        progress) AND the periodic flush blocks until the queued steps
        really finished — a wedged device stalls that flush, the beats
        stop, and the watchdog fires.  Hang-detection latency therefore
        grows by up to --log_flush_every dispatch intervals.
        """
        self.profiler.update(step)
        if self._deferred is None:
            from multimodal_similarity_tpu.utils.logging import (
                DeferredStepLogs)
            self._deferred = DeferredStepLogs(
                self.logger, flush_every=getattr(
                    self.cfg, "log_flush_every", 32),
                echo=not self.cfg.silent_mode)
        self._deferred.append(step, device_scalars, host_scalars, echo_fn)
        if self.watchdog is not None:
            self.watchdog.beat()

    def flush_logs(self):
        """Block until every queued step's scalars are logged (epoch
        boundaries, validation, preemption, close)."""
        if self._deferred is not None:
            self._deferred.flush()

    def preempted(self, state) -> bool:
        """Poll at step boundaries: on a preemption signal (or a fired
        watchdog), checkpoint the exact step so --model_path resumes with
        zero lost work, report, and tell the caller to leave its loop
        (utils/preemption.py).  The decision is COLLECTIVE on multi-process
        runs (sync_should_stop) and only process 0 claims the checkpoint."""
        from multimodal_similarity_tpu.utils.preemption import (
            report_preemption, sync_should_stop)
        if not sync_should_stop(self._guard, self._pcount):
            return False
        self.flush_logs()  # queued steps are part of the saved run
        report_preemption(self.cfg.name, state, self.ckpt, self._pid)
        return True

    def close(self):
        if self._deferred is not None:
            self._deferred.close()  # best-effort on the crash path
        if self.watchdog is not None:
            self.watchdog.cancel()
        self._guard.restore()
        self.profiler.close()
        self.logger.close()
        # LAST: if the async epoch checkpoint failed, raise only after
        # the watchdog/signal-handler/logger cleanup has run (a raise
        # here must not leak an armed watchdog or hijacked SIGTERM)
        self.ckpt.wait()
