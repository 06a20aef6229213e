"""On-disk dataset contract.

Honors the reference layout exactly (data_io.py:12-106):
  DATA_ROOT/features/<session><suffix>.npy      per-frame features
  DATA_ROOT/labels/<session>_{goal,stimuli}.pkl  {'label': ..., 's': RLE
      segment boundaries, 'G': per-segment raw labels}
Event slicing reproduces load_data_and_label: drop events shorter than
MIN_LENGTH (background shorter than MIN_LENGTH_BACKGROUND), cap at
MAX_LENGTH frames, optionally apply the 11->7 label transfer.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from multimodal_similarity_tpu.data.honda import (
    LABEL_TRANSFER,
    MAX_LENGTH,
    MIN_LENGTH,
    MIN_LENGTH_BACKGROUND,
    MODALITY_SUFFIX,
)


def modality_suffix(feat: str) -> str:
    if feat not in MODALITY_SUFFIX:
        raise NotImplementedError(f"unknown modality: {feat}")
    return MODALITY_SUFFIX[feat]


def prepare_dataset(data_dir: str, sessions: Sequence[str], feat: str,
                    label_dir: Optional[str] = None,
                    label_type: str = "goal") -> List[Tuple[str, str]]:
    """session ids -> [(feat_path, label_path)] (data_io.py:12-37)."""
    appendix = modality_suffix(feat)
    dataset = []
    for sess in sessions:
        feat_path = os.path.join(data_dir, sess + appendix)
        label_path = os.path.join(label_dir, f"{sess}_{label_type}.pkl")
        dataset.append((feat_path, label_path))
    return dataset


def prepare_multimodal_dataset(data_dir: str, sessions: Sequence[str],
                               feat_list: Sequence[str],
                               label_dir: Optional[str] = None,
                               label_type: str = "goal") -> List[List[str]]:
    """session ids -> [[feat_path...,  label_path]] (data_io.py:39-71)."""
    dataset = []
    for sess in sessions:
        row = [os.path.join(data_dir, sess + modality_suffix(feat))
               for feat in feat_list]
        row.append(os.path.join(label_dir, f"{sess}_{label_type}.pkl"))
        dataset.append(row)
    return dataset


def _tsn_sampling_plan(preprocess_func):
    """Decompose a TSN prepare partial -> (n_seg, randint, is_test) or None.

    The loaders bind prepare functions as functools.partial chains
    (tsn.make_prepare_input, loader._bind_rng); unwrap them so the native
    gather path below can precompute the same offsets the Python sampler
    would draw.  Outer bindings win on keyword conflicts, matching
    functools.partial call semantics.
    """
    import functools

    func, n_seg, kw = preprocess_func, None, {}
    while isinstance(func, functools.partial):
        for k, v in (func.keywords or {}).items():
            kw.setdefault(k, v)
        if func.args:
            n_seg = func.args[0]
        func = func.func
    from multimodal_similarity_tpu.data import tsn as _tsn

    if n_seg is None:
        return None
    if func is _tsn.tsn_prepare_input:
        rng = kw.get("rng")
        randint = rng.randint if rng is not None else np.random.randint
        return int(n_seg), randint, False
    if func is _tsn.tsn_prepare_input_test:
        return int(n_seg), None, True
    return None


def _load_events_tsn_native(feats, label, preprocess_func, transfer):
    """Native fast path for TSN-sampled sessions: copy only the n_seg
    sampled frames per event instead of materializing the full (up to
    MAX_LENGTH-frame) window first — at Honda video dims that is 15x less
    memory traffic per event.  Returns (events, labels, boundary) like
    load_data_and_label, or None to defer to the generic Python loop.

    Bit-identical to the Python path: offsets are drawn from the same RNG
    in the same per-event order, and eligibility (native lib present,
    float32 C-contiguous features) is decided BEFORE any draw so the RNG
    stream never diverges between the two paths.
    """
    plan = _tsn_sampling_plan(preprocess_func) if preprocess_func else None
    if plan is None:
        return None
    if feats.dtype != np.float32 or not feats.flags["C_CONTIGUOUS"]:
        return None
    from multimodal_similarity_tpu.data.native import (
        load_native, native_gather_segments)

    if load_native() is None:
        return None
    n_seg, randint, is_test = plan

    starts, offsets, labels, boundary = [], [], [], []
    for i in range(len(label["G"])):
        length = label["s"][i + 1] - label["s"][i]
        if length > MIN_LENGTH:
            if label["G"][i] == 0 and length < MIN_LENGTH_BACKGROUND:
                continue
            length = min(length, MAX_LENGTH)
            avg = length // n_seg
            if avg <= 0:
                raise NotImplementedError(
                    f"sequence of {length} frames too short for "
                    f"{n_seg} segments")
            if is_test:
                offs = np.array([int(avg / 2.0 + avg * x)
                                 for x in range(n_seg)], np.int64)
            else:
                offs = np.multiply(range(n_seg), avg) + \
                    randint(avg, size=n_seg)
            starts.append(int(label["s"][i]))
            offsets.append(offs)
            labels.append(LABEL_TRANSFER[label["G"][i]] if transfer
                          else label["G"][i])
            boundary.append((label["s"][i], label["s"][i] + length))

    if not starts:
        return None  # generic path raises the loud no-event error
    flat = feats.reshape(feats.shape[0], -1)
    out = native_gather_segments(
        flat, np.asarray(starts, np.int64),
        np.asarray(offsets, np.int64))
    if out is None:
        return None
    events = out.reshape((len(starts), n_seg) + feats.shape[1:])
    return (events, np.asarray(labels, np.int32).reshape(-1, 1), boundary)


def load_data_and_label(
    feat_path: str,
    label_path: str,
    preprocess_func: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    transfer: bool = True,
):
    """Load one session and slice per-event windows (data_io.py:73-106).

    Returns (events [N, ...], labels [N, 1] int32, boundaries [(s, e)]).
    ``preprocess_func`` maps a [length, ...] frame window to a [1, ...] model
    input (e.g. TSN segment sampling).
    """
    if preprocess_func is None:
        preprocess_func = lambda x: x

    feats = np.load(feat_path, mmap_mode="r")
    with open(label_path, "rb") as f:
        label = pickle.load(f)

    fast = _load_events_tsn_native(feats, label, preprocess_func, transfer)
    if fast is not None:
        return fast

    events, labels, boundary = [], [], []
    for i in range(len(label["G"])):
        length = label["s"][i + 1] - label["s"][i]
        if length > MIN_LENGTH:
            if label["G"][i] == 0 and length < MIN_LENGTH_BACKGROUND:
                continue
            length = min(length, MAX_LENGTH)
            window = np.asarray(feats[label["s"][i]: label["s"][i] + length])
            events.append(preprocess_func(window))
            labels.append(LABEL_TRANSFER[label["G"][i]] if transfer
                          else label["G"][i])
            boundary.append((label["s"][i], label["s"][i] + length))

    if not events:
        raise ValueError(
            f"no event in session {feat_path!r} survives the length "
            f"filters (MIN_LENGTH={MIN_LENGTH}, MIN_LENGTH_BACKGROUND="
            f"{MIN_LENGTH_BACKGROUND}); {len(label['G'])} raw segments")
    events = np.concatenate(events, axis=0).astype("float32")
    labels = np.asarray(labels, dtype="int32").reshape(-1, 1)
    return events, labels, boundary


def load_validation_set(dataset, preprocess_func=None, transfer: bool = True):
    """Concatenate every session of a prepared dataset (the per-trainer
    val-preload loop, base_model.py:172-185).

    Returns (feats, labels, session_ids, boundaries)."""
    feats, labels, sess, boundaries = [], [], [], []
    for row in dataset:
        session_id = os.path.basename(row[-1]).split("_")[0]
        eve, lab, bou = load_data_and_label(row[0], row[-1], preprocess_func,
                                            transfer)
        feats.append(eve)
        labels.append(lab)
        sess.extend([session_id] * eve.shape[0])
        boundaries.extend(bou)
    return (np.concatenate(feats, axis=0), np.concatenate(labels, axis=0),
            sess, boundaries)
