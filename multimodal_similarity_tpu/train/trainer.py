"""Shared trainer scaffolding: experiment setup, validation, checkpoint cadence.

Mirrors the skeleton every reference trainer repeats (build graph ->
iterators -> session -> epoch loop -> mine -> train -> validate ->
checkpoint, SURVEY.md §2.5) as plain composable helpers.
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Optional

import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import write_configure_to_file
from multimodal_similarity_tpu.eval.metrics import retrieval_metrics_device
from multimodal_similarity_tpu.train.steps import embed_in_chunks


def feature_caster(cfg):
    """Host-side feature cast for --bf16_features: halves the host->device
    transfer and the step's dominant HBM read; params/losses stay f32."""
    if getattr(cfg, "bf16_features", False):
        import ml_dtypes

        return lambda a: np.asarray(a).astype(ml_dtypes.bfloat16)
    return lambda a: a


def setup_experiment(cfg, timestamp: bool = True,
                     result_dir: Optional[str] = None) -> str:
    """Create the result dir (<result_root>/<name>_<ts>, or the explicit
    ``result_dir``) and dump config (base_model.py:91-95)."""
    if result_dir is None:
        name = cfg.name
        if timestamp:
            name = name + "_" + datetime.now().strftime("%Y%m%d-%H%M%S")
        result_dir = os.path.join(cfg.result_root, name)
    os.makedirs(result_dir, exist_ok=True)
    write_configure_to_file(cfg, result_dir)
    np.random.seed(cfg.seed)
    return result_dir


# one-slot device cache for the validation feature tensor: trainers call
# validate() every epoch with the same host array; re-uploading the full
# val set over PCIe each time is pure waste (GBs/epoch at Honda dims).
# The slot holds a weakref to the host array and is only hit when the
# referent is the SAME live object — a bare id() key would go stale if
# the original array were freed and CPython reused its id for a new
# same-shape array (plausible across back-to-back runs in one process).
_VAL_DEVICE_CACHE: dict = {}


def _val_feats_on_device(val_feats):
    import weakref

    key = id(val_feats)
    entry = _VAL_DEVICE_CACHE.get(key)
    if entry is not None:
        host_ref, dev = entry
        if host_ref() is val_feats:
            return dev
    dev = jnp.asarray(np.asarray(val_feats))
    _VAL_DEVICE_CACHE.clear()
    try:
        _VAL_DEVICE_CACHE[key] = (weakref.ref(val_feats), dev)
    except TypeError:
        pass  # non-weakrefable input: skip caching, stay correct
    return dev


def cached_device(array):
    """Device-resident copy of a long-lived host array (one-slot cache keyed
    by object identity; see _val_feats_on_device)."""
    return _val_feats_on_device(array)


def validate(embed_fn, params, val_feats, val_labels, chunk: int = 256,
             beat=None):
    """Per-epoch validation: chunked embed + device leave-one-out metrics
    (replaces base_model.py:307-313's host loop).  ``beat`` heartbeats a
    hang watchdog per embedded chunk so a long (healthy) validation pass
    is progress, not a false hang."""
    emb = embed_in_chunks(embed_fn, params, _val_feats_on_device(val_feats),
                          chunk=chunk, beat=beat)
    mAP, mPrec, recalls = retrieval_metrics_device(emb, val_labels.reshape(-1))
    if beat is not None:
        beat()
    return {"val_mAP": mAP, "val_mPrec": mPrec,
            "val_recall@1": recalls[1]}, emb


def epoch_of_step(step: int, batch_per_epoch: int) -> int:
    """Resume-accurate epoch derivation (base_model.py:216-217)."""
    return int(step) // max(batch_per_epoch, 1)
