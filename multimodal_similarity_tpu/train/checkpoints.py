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

    def save(self, target: Any, step: int) -> str:
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

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
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
