import json
import os
import pickle

import numpy as np

from multimodal_similarity_tpu.eval.analysis import (
    format_confusion, label_distribution, summarize_results)
from multimodal_similarity_tpu.utils import MetricsLogger, StepTimer, time_fn
from multimodal_similarity_tpu.utils.logging import write_projector_metadata


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    logger.log(1, {"loss": 0.5})
    logger.log(2, {"loss": 0.25, "acc": 0.9})
    logger.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().strip().split("\n")]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["acc"] == 0.9


def test_deferred_step_logs_records_every_step(tmp_path, capfd):
    """DeferredStepLogs must produce the SAME JSONL stream as synchronous
    logging — every step, in order, values exact, each record stamped
    with its append (enqueue) time — while only touching device values at
    flush boundaries."""
    import jax.numpy as jnp

    from multimodal_similarity_tpu.utils.logging import DeferredStepLogs

    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    d = DeferredStepLogs(logger, flush_every=4, echo=True)
    flushes = []
    for s in range(1, 11):
        flushed = d.append(s, {"loss": jnp.float32(s * 0.5)},
                           {"learning_rate": 0.1},
                           echo_fn=lambda sc, s=s: f"step {s} "
                                                   f"loss {sc['loss']:.1f}")
        flushes.append(flushed)
    assert flushes == [False, False, False, True] * 2 + [False, False]
    d.flush()  # tail: steps 9-10
    logger.close()

    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().strip().split("\n")]
    assert [r["step"] for r in lines] == list(range(1, 11))
    assert all(r["loss"] == r["step"] * 0.5 for r in lines)
    assert all(r["learning_rate"] == 0.1 for r in lines)
    # append-time stamps are monotone in step order
    assert all(lines[i]["time"] <= lines[i + 1]["time"] for i in range(9))
    out = capfd.readouterr().out
    assert out.count("loss") == 10  # deferred echo still prints per step


def test_deferred_step_logs_flush_every_one_is_synchronous(tmp_path):
    from multimodal_similarity_tpu.utils.logging import DeferredStepLogs

    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    d = DeferredStepLogs(logger, flush_every=1, echo=False)
    assert d.append(1, {"loss": 1.0}) is True  # flushed immediately
    logger.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().split("\n")
    assert len(lines) == 1


def test_projector_metadata(tmp_path):
    labels = np.array([[1], [2]])
    path = write_projector_metadata(str(tmp_path), labels, ["s1", "s2"],
                                    [(0, 5), (5, 9)])
    rows = open(path).read().strip().split("\n")
    assert rows[0].startswith("id\tlabel")
    assert rows[1] == "0\t1\ts1\t0\t5"


def test_step_timer():
    import time
    t = StepTimer()
    with t.phase("load"):
        time.sleep(0.01)
    with t.phase("train"):
        time.sleep(0.005)
    out = t.reset()
    assert out["load"] >= 0.01
    assert "train" in out
    assert t.reset() == {}


def test_time_fn():
    import jax.numpy as jnp
    dt = time_fn(lambda x: x * 2, jnp.ones(8), reps=2)
    assert dt >= 0


def test_label_distribution():
    txt = label_distribution(np.array([0, 0, 1, 2, 2, 2]))
    assert "Background" in txt and "0.5000" in txt


def test_summarize_results(tmp_path):
    results = {
        "mAP": 0.75, "mAP_macro": 0.7, "mPrec": 0.5,
        "recall": [0.6, 0.7, 0.8, 0.9, 0.95, 1.0],
        "mAP_event": {1: 0.8, 2: 0.7},
        "confusion": {"confusion_matrix": np.eye(3, dtype="float32"),
                      "labels": [0, 1, 2]},
    }
    p = tmp_path / "results.pkl"
    with open(p, "wb") as f:
        pickle.dump(results, f)
    txt = summarize_results(str(p))
    assert "mAP        = 0.7500" in txt
    assert "Recall@32" in txt
    assert "Intersection passing" in txt
    assert "confusion" in txt


def test_step_watchdog_fires_and_cancels():
    import time
    from multimodal_similarity_tpu.utils import StepWatchdog
    fired = []
    wd = StepWatchdog(timeout=0.05, on_timeout=lambda: fired.append(1))
    with wd.step():
        time.sleep(0.12)          # exceeds deadline -> fires
    assert wd.fired == 1
    with wd.step():
        pass                      # fast step -> cancelled
    time.sleep(0.1)
    assert wd.fired == 1


def test_step_window_profiler_resume_relative(monkeypatch, tmp_path):
    """The trace window is relative to the FIRST observed step, so a
    checkpoint-resumed run (steps starting at e.g. 101) still traces
    num_steps steps instead of collapsing to one."""
    import jax as _jax
    from multimodal_similarity_tpu.utils.profiling import StepWindowProfiler

    calls = []
    monkeypatch.setattr(_jax.profiler, "start_trace",
                        lambda d: calls.append(("start",)))
    monkeypatch.setattr(_jax.profiler, "stop_trace",
                        lambda: calls.append(("stop",)))

    prof = StepWindowProfiler(str(tmp_path), num_steps=3)
    for step in range(101, 110):     # resumed run: absolute steps 101..109
        prof.update(step)
    prof.close()
    assert calls == [("start",), ("stop",)]
    # started after the first observed (compile) step, stopped 3 steps later
    sp = StepWindowProfiler(str(tmp_path), num_steps=3)
    sp.update(101)                   # compile step: starts the window
    assert sp._active
    sp.update(102)
    sp.update(103)
    assert sp._active                # 2 steps in the window so far
    sp.update(104)                   # 3rd step: window complete
    assert not sp._active and sp._done


def test_preemption_guard_signal_and_restore():
    import os
    import signal as _signal
    from multimodal_similarity_tpu.utils.preemption import PreemptionGuard

    seen = []
    prev = _signal.signal(_signal.SIGUSR1, lambda s, f: seen.append(s))
    try:
        with PreemptionGuard(signals=(_signal.SIGUSR1,)) as guard:
            assert not guard.should_stop
            os.kill(os.getpid(), _signal.SIGUSR1)
            assert guard.wait(2.0) and guard.should_stop
            # the previously-installed handler chained
            assert seen == [_signal.SIGUSR1]
        # restored: a new signal hits only the old handler
        os.kill(os.getpid(), _signal.SIGUSR1)
        import time
        time.sleep(0.05)
        assert seen == [_signal.SIGUSR1] * 2
        assert not guard._installed
    finally:
        _signal.signal(_signal.SIGUSR1, prev)


def test_validate_beats_watchdog_per_chunk():
    """Epoch-boundary validation heartbeats a hang watchdog per embedded
    chunk (+ once after the metrics pass), so a long healthy validation
    is progress rather than a false hang."""
    import jax.numpy as jnp
    import numpy as np
    from multimodal_similarity_tpu.train.trainer import validate

    beats = []
    feats = np.random.RandomState(0).randn(10, 4).astype(np.float32)
    labels = np.asarray([1, 1, 2, 2, 3, 3, 1, 2, 3, 1])
    metrics, emb = validate(lambda p, x: jnp.asarray(x) * p, 2.0, feats,
                            labels, chunk=4, beat=lambda: beats.append(1))
    assert len(beats) == 3 + 1  # ceil(10/4) chunks + the metrics pass
    assert np.isfinite(metrics["val_mAP"])


def test_preemption_guard_reasserts_own_handler_on_poll(monkeypatch):
    """The should_stop poll must re-assert the OS disposition even when
    getsignal already reports THIS guard's handler: getsignal only sees
    the Python-level view, so after a native sigaction clobber it keeps
    returning the handler although the OS disposition is gone.  Only
    ANOTHER live guard's handler is skipped (nested guards)."""
    import signal as _signal
    from multimodal_similarity_tpu.utils import preemption as _pre

    with _pre.PreemptionGuard(signals=(_signal.SIGUSR1,)) as guard:
        asserted = []
        real_signal = _signal.signal
        monkeypatch.setattr(
            _pre.signal, "signal",
            lambda sig, h: asserted.append((sig, h)) or real_signal(sig, h))
        guard.should_stop
        assert (_signal.SIGUSR1, guard._handle) in asserted

        # a different guard owning the signal is NOT clobbered
        inner = _pre.PreemptionGuard(signals=(_signal.SIGUSR1,)).install()
        try:
            asserted.clear()
            guard.should_stop
            assert asserted == []
            assert _signal.getsignal(_signal.SIGUSR1) == inner._handle
        finally:
            inner.restore()


def test_preemption_guard_inert_off_main_thread():
    import threading
    from multimodal_similarity_tpu.utils.preemption import PreemptionGuard

    out = {}

    def worker():
        g = PreemptionGuard().install()   # must not raise off-main
        out["installed"] = g._installed
        g.request_stop()
        out["stops"] = g.should_stop

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert out == {"installed": False, "stops": True}


def test_sync_should_stop_throttles_collective(monkeypatch):
    """With pcount>1 the all-gather runs only on every-K lockstep steps
    (plus forced syncs when step is omitted) — all hosts compute the same
    throttle decision, keeping collective call counts aligned."""
    import numpy as np
    from multimodal_similarity_tpu.utils import preemption as _pre

    calls = []

    def fake_allgather(x):
        calls.append(int(np.asarray(x)))
        return np.asarray([0, calls[-1]])

    import types
    fake_mh = types.SimpleNamespace(process_allgather=fake_allgather)
    import jax.experimental
    monkeypatch.setattr(jax.experimental, "multihost_utils", fake_mh,
                        raising=False)

    g = _pre.PreemptionGuard()  # not installed: flag only
    # steps 1..16 at every=8: collective fires at 8 and 16 only
    fired = [s for s in range(1, 17)
             if _pre.sync_should_stop(g, 2, step=s, every=8)]
    assert len(calls) == 2 and fired == []
    # a locally-stopped host is seen at the next sync point
    g.request_stop()
    assert not _pre.sync_should_stop(g, 2, step=9, every=8)  # throttled
    assert _pre.sync_should_stop(g, 2, step=16, every=8)
    # forced sync (no step): always gathers
    n = len(calls)
    assert _pre.sync_should_stop(g, 2)
    assert len(calls) == n + 1
    # single process short-circuits with no collective
    n = len(calls)
    assert _pre.sync_should_stop(g, 1, step=3)
    assert len(calls) == n


def test_install_hang_watchdog_fires_stop_and_dumps(capfd):
    """--watchdog_secs wiring: a stalled step fires the watchdog, which
    dumps tracebacks and requests a preemption-style stop on the guard
    (the trainer's step-boundary poll then checkpoints and exits)."""
    import time

    from multimodal_similarity_tpu.utils.preemption import PreemptionGuard
    from multimodal_similarity_tpu.utils.watchdog import install_hang_watchdog

    assert install_hang_watchdog("t", 0.0, None) is None  # disabled
    guard = PreemptionGuard()
    wd = install_hang_watchdog("t", 0.08, guard)
    try:
        # heartbeats hold the deadline off
        for _ in range(3):
            time.sleep(0.03)
            wd.beat()
        assert not guard.should_stop
        time.sleep(0.2)  # artificial stall: no heartbeat
        assert guard.should_stop
        assert wd.fired == 1
        err = capfd.readouterr().err
        assert "watchdog" in err and "thread dump" in err
        assert "Current thread" in err or "Thread" in err  # faulthandler
    finally:
        wd.cancel()


def test_watchdog_beat_keeps_single_timer():
    from multimodal_similarity_tpu.utils import StepWatchdog

    fired = []
    wd = StepWatchdog(timeout=0.05, on_timeout=lambda: fired.append(1))
    for _ in range(5):
        wd.beat()
    import time
    time.sleep(0.15)
    wd.cancel()
    assert fired == [1]  # stale timers from earlier beats never fire
