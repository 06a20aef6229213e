"""Metrics logging.

Replaces the reference's TensorBoard scalar/histogram writers
(base_model.py:293-297) with a JSONL stream (always) plus TensorBoard when
the optional dependency is present.  Also writes the embedding-projector
metadata TSV the reference emits per epoch (base_model.py:187-192).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsLogger:
    def __init__(self, result_dir: str, use_tensorboard: bool = True):
        self.result_dir = result_dir
        os.makedirs(result_dir, exist_ok=True)
        self._jsonl = open(os.path.join(result_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:  # torch's tensorboard writer, if the package exists
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(result_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float],
            prefix: str = "", at: float = None) -> None:
        rec = {"step": int(step), "time": at if at is not None else time.time()}
        for k, v in scalars.items():
            key = f"{prefix}{k}"
            if key in ("step", "time"):
                # never let a scalar clobber the record's own step/wall-
                # clock fields (downstream JSONL analysis parses both)
                key = f"scalar_{key}"
            rec[key] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(key, float(v), int(step))
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class DeferredStepLogs:
    """Queue per-step device scalars; read them back every N steps.

    ``float()`` on a jax scalar blocks until the device has finished the
    step and the value has crossed the link.  On a co-located host that
    costs microseconds; over a remote-coordinator / tunneled link it
    serializes dispatch — step N+1 cannot be enqueued until step N's
    scalars round-trip, so every step pays a link RTT on top of its
    compute.  Queuing the (few-byte) device scalars and converting every
    ``flush_every`` appends keeps JAX's async dispatch pipeline full
    while still recording EVERY step's values exactly: the JSONL stream
    is identical to the synchronous path except that records land up to
    ``flush_every`` steps later (each record's ``time`` field is the
    step's enqueue time, captured at append).

    ``flush()`` is the synchronization point: it blocks until every
    queued step has truly finished on the device, which is also why the
    trainers' hang watchdog beats ride on it (a wedged device stalls the
    flush, the beats stop, the watchdog fires — see
    HondaExperiment.log_deferred).
    """

    def __init__(self, logger: MetricsLogger, flush_every: int = 32,
                 echo: bool = True):
        self.logger = logger
        self.flush_every = max(int(flush_every), 1)
        self.echo = echo
        self._pending = []

    def append(self, step: int, device_scalars, host_scalars=None,
               echo_fn=None) -> bool:
        """Queue one step's scalars; returns True when this append
        triggered a (blocking) flush."""
        self._pending.append(
            (step, device_scalars, host_scalars, echo_fn, time.time()))
        if len(self._pending) >= self.flush_every:
            self.flush()
            return True
        return False

    def flush(self) -> None:
        pending, self._pending = self._pending, []
        for step, dev, host, echo_fn, at in pending:
            scalars = {k: float(v) for k, v in dev.items()}
            if host:
                scalars.update({k: float(v) for k, v in host.items()})
            self.logger.log(step, scalars, at=at)
            if echo_fn is not None and self.echo:
                print(echo_fn(scalars))

    def close(self) -> None:
        """Best-effort flush for crash epilogues: when a step raised, the
        queued device scalars are usually poisoned by the same error —
        converting them would mask the original traceback, so failures
        here are reported and swallowed."""
        n = len(self._pending)
        try:
            self.flush()
        except Exception as e:  # noqa: BLE001 — crash path must not mask
            import sys
            print(f"[logging] dropped up to {n} queued step records "
                  f"after error: {e!r}", file=sys.stderr)
            self._pending = []


def write_projector_embedding(result_dir: str, embeddings,
                              filename: str = "embedding_val.tsv") -> str:
    """Embedding values TSV for the TensorBoard projector."""
    path = os.path.join(result_dir, filename)
    with open(path, "w") as fout:
        for row in embeddings:
            fout.write("\t".join(f"{v:.6g}" for v in row) + "\n")
    return path


def write_projector_config(result_dir: str,
                           tensor_filename: str = "embedding_val.tsv",
                           metadata_filename: str = "metadata_val.tsv",
                           ) -> str:
    """projector_config.pbtxt wiring the embedding to its metadata.

    The reference wires the projector to a TF checkpoint variable each
    epoch (base_model.py:316-320); checkpoints here are flax pytrees, so
    the config uses the projector's tensor_path TSV form instead — same
    visualization, no TF variable needed.
    """
    path = os.path.join(result_dir, "projector_config.pbtxt")
    with open(path, "w") as fout:
        fout.write("embeddings {\n"
                   f"  tensor_path: \"{tensor_filename}\"\n"
                   f"  metadata_path: \"{metadata_filename}\"\n"
                   "}\n")
    return path


def write_projector_metadata(result_dir: str, labels, sessions=None,
                             boundaries=None,
                             filename: str = "metadata_val.tsv") -> str:
    """id/label/session/start/end TSV (base_model.py:188-192)."""
    path = os.path.join(result_dir, filename)
    with open(path, "w") as fout:
        fout.write("id\tlabel\tsession_id\tstart\tend\n")
        for i in range(len(labels)):
            lab = labels[i][0] if hasattr(labels[i], "__len__") else labels[i]
            sess = sessions[i] if sessions is not None else ""
            s, e = boundaries[i] if boundaries is not None else ("", "")
            fout.write(f"{i}\t{lab}\t{sess}\t{s}\t{e}\n")
    return path
