"""Preemption-safe shutdown: catch SIGTERM, finish the step, checkpoint.

Cloud TPU VMs (and most batch schedulers) deliver SIGTERM with a grace
window before a preemption/maintenance kill.  The reference's only
recovery story was manual restart-from-checkpoint (SURVEY.md §5: every
trainer re-derives its epoch from the restored global step).  This guard
closes the other half: trainers poll ``should_stop`` at step boundaries
and write a final checkpoint before exiting, so a preempted run resumes
exactly where it stopped instead of losing up to an epoch of work.

Usage (the pattern the trainers follow)::

    with PreemptionGuard() as guard:
        for batch in stream:
            state, aux = step_fn(state, ...)
            if guard.should_stop:
                ckpt.save(state, int(state.step))
                break

The handler only sets a flag — no I/O happens in signal context — and
chains any previously-installed handler so embedding frameworks keep
their own shutdown hooks.  Installing from a non-main thread (where
CPython forbids ``signal.signal``) degrades to an inert guard rather
than failing, so library users can call trainers from worker threads.

Reliability notes, both validated on the real chip (RESULTS.md):
(1) the signal must reach the *python* process — wrapping the trainer in
a shell pipeline and signalling the shell orphans the trainer instead of
stopping it (use ``timeout``/``exec`` or signal the python pid);
(2) a preemption landing while the main thread is stuck in a very long
device RPC cannot run any Python handler until the call returns — that
failure mode is a hang, which is the watchdog's jurisdiction: every loop
trainer wires one via ``--watchdog_secs``
(utils/watchdog.install_hang_watchdog; a fired watchdog requests a stop
on this guard, so the two compose).  ``should_stop`` additionally
re-asserts the OS disposition at every poll, so anything that replaces
the handler from native code is overridden within one step.
"""

from __future__ import annotations

import signal
import threading
from typing import Optional, Sequence


class PreemptionGuard:
    """Flag-setting SIGTERM/SIGINT guard with handler chaining."""

    def __init__(self, signals: Sequence[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._stop = threading.Event()
        self._previous: dict = {}
        self._installed = False
        self._signal_time: Optional[float] = None  # first REAL signal

    # -- lifecycle ---------------------------------------------------------
    def install(self) -> "PreemptionGuard":
        if self._installed:
            return self
        if threading.current_thread() is not threading.main_thread():
            return self  # inert: CPython only allows handlers on main
        for sig in self._signals:
            self._previous[sig] = signal.signal(sig, self._handle)
        self._installed = True
        return self

    def restore(self) -> None:
        if not self._installed:
            return
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        self._previous.clear()
        self._installed = False

    def __enter__(self) -> "PreemptionGuard":
        return self.install()

    def __exit__(self, *exc) -> None:
        self.restore()

    # -- signal path -------------------------------------------------------
    #: seconds a first SIGTERM gets to reach a checkpoint before a repeat
    #: escalates to termination — supervisors commonly deliver duplicates
    #: within milliseconds (process group + child), which must NOT kill
    #: the run before any step-boundary poll could respond.  Sized to a
    #: real preemption grace window (tens of seconds): a long compile,
    #: validation pass, or slow step must be allowed to reach its next
    #: step-boundary poll even if the supervisor re-delivers SIGTERM
    #: periodically in the meantime.  Class attribute — override per
    #: guard instance when a platform's grace window is known.
    ESCALATE_AFTER_S = 45.0

    def _handle(self, signum, frame) -> None:
        import time

        if self._signal_time is not None and \
                time.monotonic() - self._signal_time > self.ESCALATE_AFTER_S:
            # repeated signal after a real grace window: the sender means
            # it — restore the previous dispositions and re-deliver so
            # termination proceeds even if no loop is polling this guard
            # (e.g. it leaked past an exception, or the work is stuck)
            self.restore()
            signal.raise_signal(signum)
            return
        if self._signal_time is None:
            self._signal_time = time.monotonic()
        self._stop.set()
        prev = self._previous.get(signum)
        if callable(prev):  # chain embedding frameworks' own hooks
            prev(signum, frame)

    # -- consumer API ------------------------------------------------------
    @property
    def should_stop(self) -> bool:
        # Re-assert the OS disposition on every poll: some PJRT runtimes
        # (observed with the tunneled TPU backend) transiently reset the
        # process's SIGTERM disposition from native code, which would let
        # a later signal kill the process despite an installed Python
        # handler.  One sigaction syscall per step boundary is free; it
        # shrinks the clobber window to at most one step.
        if self._installed and \
                threading.current_thread() is threading.main_thread():
            for sig in self._signals:
                try:
                    # don't clobber ANOTHER live guard's handler (nested
                    # guards: a library caller wrapping a trainer that
                    # installs its own).  When getsignal returns OUR OWN
                    # handler we still re-assert: getsignal only reflects
                    # the Python-level view, so after a native sigaction
                    # clobber it keeps returning this handler even though
                    # the OS disposition is gone — skipping here would
                    # defeat the repair this poll exists for.
                    cur = signal.getsignal(sig)
                    owner = getattr(cur, "__self__", None)
                    if isinstance(owner, PreemptionGuard) and \
                            owner is not self:
                        continue
                    signal.signal(sig, self._handle)
                except (ValueError, OSError):  # pragma: no cover
                    pass
        return self._stop.is_set()

    def request_stop(self) -> None:
        """Programmatic stop (tests, orchestration glue)."""
        self._stop.set()

    def wait(self, timeout: Optional[float] = None) -> bool:
        return self._stop.wait(timeout)


def sync_should_stop(guard: PreemptionGuard, pcount: int = 1,
                     step: Optional[int] = None, every: int = 8) -> bool:
    """Collective stop decision for multi-process training.

    A SIGTERM may reach only some hosts (or at different step boundaries);
    a host that exits alone leaves its peers blocked in the next
    collective.  When more than one process is live, all-gather each
    host's local flag and stop iff ANY host saw the signal — every host
    then leaves the step loop at the same step boundary, keeping the
    final checkpoint and the collectives in lockstep.

    The all-gather blocks the host thread, so per-step polling would gate
    every step on the slowest host: pass the (lockstep) ``step`` counter
    and the collective runs only every ``every`` steps — preemption grace
    windows are tens of seconds, so detecting a signal a few steps late
    costs nothing.  All hosts compute the same throttle decision, keeping
    the collective call counts aligned.  Omit ``step`` to force a sync
    (e.g. once per epoch boundary).
    """
    if pcount <= 1:
        return guard.should_stop
    if step is not None and every > 1 and step % every:
        return False
    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray(guard.should_stop, np.int32))
    return bool(np.any(flags))


def report_preemption(name: str, state, ckpt, pid: int = 0) -> None:
    """Shared preemption epilogue: process 0 checkpoints the exact step;
    other processes report that they are stopping without claiming a
    checkpoint they did not write."""
    step = int(state.step)
    if pid == 0:
        ckpt.save(state, step)
        print(f"[{name}] preemption signal: checkpointed at step {step}; "
              f"exiting")
    else:
        print(f"[{name}] preemption signal: stopping at step {step} "
              f"(checkpoint owned by process 0); exiting")
