"""Checkpointing.

Equivalent of the reference's ``tf.train.Saver(max_to_keep=10)`` per-epoch
snapshots named ``<name>.ckpt-<global_step>`` (base_model.py:160,323) plus
its two variable-name-surgery workflows:

- scope-stripped branch restore (multimodal_model.py:200-217): load a
  checkpoint trained standalone into a named subtree of a bigger model —
  :func:`restore_subtree`;
- prefix-added eval restore (evaluate_model.py:59-63): load one branch of a
  multi-branch checkpoint into a bare model — also :func:`restore_subtree`
  with ``from_scope``.

Format: flax msgpack serialization of the param/opt-state pytree, one file
per step, with pruning to ``max_to_keep`` and step-accurate resume (the
reference derives epoch from the restored global_step, base_model.py:216).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional

from flax import serialization


class CheckpointManager:
    def __init__(self, directory: str, name: str = "model",
                 max_to_keep: int = 10):
        self.directory = directory
        self.name = name
        self.max_to_keep = max_to_keep
        self._writer = None   # in-flight async write (save_async)
        self._writer_err = None
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"{self.name}.ckpt-{step}")

    def all_steps(self):
        pat = re.compile(re.escape(self.name) + r"\.ckpt-(\d+)$")
        steps = []
        for p in glob.glob(os.path.join(self.directory, f"{self.name}.ckpt-*")):
            m = pat.search(p)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def _write(self, target: Any, step: int) -> str:
        # write-then-rename: a crash mid-write must never leave a truncated
        # file at the final path, or latest_step() would resume from it
        path = self._path(step)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(target))
        os.replace(tmp, path)
        for old in self.all_steps()[: -self.max_to_keep]:
            os.remove(self._path(old))
        return path

    def save(self, target: Any, step: int) -> str:
        self.wait()  # never two writers pruning concurrently
        return self._write(target, step)

    def save_async(self, target: Any, step: int) -> None:
        """Per-epoch checkpointing off the training path.

        The device->host snapshot is taken HERE, synchronously — so the
        caller may immediately donate ``target`` into the next step (the
        same orbax-async split: on production hardware the D2H copy is
        PCIe-fast while serialization + storage writes are the slow
        part).  ``copy_to_host_async`` is issued for every device leaf
        first so the per-leaf transfers overlap each other.  msgpack
        serialization, the atomic write, and max_to_keep pruning run on
        a single background writer thread; at most one write is in
        flight — the next save_async (or save/restore/wait) blocks
        until it lands, so files appear in order and memory is bounded
        by one host snapshot.  Writer failures surface at the next
        wait()/save call."""
        import threading

        import jax
        import numpy as np

        for a in jax.tree_util.tree_leaves(target):
            if hasattr(a, "copy_to_host_async"):
                a.copy_to_host_async()
        host = jax.tree.map(
            lambda a: np.asarray(a)
            if hasattr(a, "copy_to_host_async") else a, target)
        self.wait()

        def work():
            try:
                self._write(host, step)
            except Exception as e:  # surfaced at the next wait()
                self._writer_err = e

        self._writer = threading.Thread(target=work, name="ckpt-writer",
                                        daemon=True)
        self._writer.start()

    def wait(self) -> None:
        """Block until the in-flight async write (if any) has landed;
        re-raise its failure here.  Call before exiting or before reading
        checkpoint files."""
        w, self._writer = self._writer, None
        if w is not None:
            w.join()
        err, self._writer_err = self._writer_err, None
        if err is not None:
            raise err

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        self.wait()  # an in-flight write may BE the latest step
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint for '{self.name}' in {self.directory}")
        with open(self._path(step), "rb") as f:
            return serialization.from_bytes(target, f.read())


def load_pytree(path: str, target: Any) -> Any:
    """Restore a single checkpoint file into ``target``'s structure."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def restore_subtree(params: Any, ckpt_params: Any,
                    into_scope: Optional[str] = None,
                    from_scope: Optional[str] = None) -> Any:
    """Graft checkpoint params across scope prefixes.

    into_scope -- place ``ckpt_params`` (or its ``from_scope`` subtree) under
        ``params[into_scope]``; None grafts at the root.
    from_scope -- take only this top-level subtree of the checkpoint.
    """
    src = ckpt_params
    if from_scope is not None:
        src = src[from_scope]
    params = dict(params)
    if into_scope is None:
        for k in src:
            if k in params:
                params[k] = src[k]
        return params
    params[into_scope] = src
    return params


def state_dict_of(tree: Any):
    """Plain nested-dict view (for cross-model partial restores)."""
    return serialization.to_state_dict(tree)


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(tree))
    os.replace(tmp, path)  # atomic: no truncated file at the final path
