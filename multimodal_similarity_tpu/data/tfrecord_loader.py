"""Event-level TFRecord loader.

Counterpart of the reference's event_generator pipeline
(data_io.py:109-163): reads the one-SequenceExample-per-event files
written by generate_event_tfrecords, shuffles, and emits fixed-shape padded
batches with true sequence lengths (for ConvLSTM-style encoders).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from multimodal_similarity_tpu.data.tfrecords import (
    parse_sequence_example,
    read_tfrecord,
)


def list_event_tfrecords(tfrecords_root: str,
                         sessions: Optional[Sequence[str]] = None):
    paths = sorted(glob.glob(os.path.join(tfrecords_root, "*.tfrecords")))
    if sessions is not None:
        keep = set(sessions)
        paths = [p for p in paths
                 if os.path.basename(p).split("_")[0] in keep]
    return paths


class EventTFRecordLoader:
    """Yields batches {features [B, max_time, D], seq_len [B], labels [B],
    mask [B]} with background prefetch."""

    def __init__(self, paths: Sequence[str], feat_name: str,
                 feat_dim: int, event_per_batch: int = 64,
                 max_time: int = 90, shuffle: bool = True, seed: int = 0,
                 prefetch: int = 2):
        self.paths = list(paths)
        self.feat_name = feat_name
        self.feat_dim = feat_dim
        self.event_per_batch = event_per_batch
        self.max_time = max_time
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch

    @property
    def batches_per_epoch(self) -> int:
        return -(-len(self.paths) // self.event_per_batch)

    def _load_event(self, path: str):
        rec = next(iter(read_tfrecord(path)))
        context, feature_lists = parse_sequence_example(rec)
        frames = feature_lists[self.feat_name]          # [T, D]
        t = min(frames.shape[0], self.max_time)
        out = np.zeros((self.max_time, self.feat_dim), np.float32)
        out[:t] = frames[:t, : self.feat_dim]
        return out, t, int(context.get("label", 0))

    def _make_batch(self, paths: List[str]) -> Dict[str, np.ndarray]:
        b = self.event_per_batch
        feats = np.zeros((b, self.max_time, self.feat_dim), np.float32)
        seq_len = np.ones((b,), np.int32)
        labels = np.zeros((b,), np.int32)
        mask = np.zeros((b,), np.float32)
        mask[: len(paths)] = 1.0

        # native C++ fast path: threaded TFRecord parse straight into the
        # batch buffer (data/native.py); Python fallback otherwise
        from multimodal_similarity_tpu.data.native import (
            native_load_event_batch)
        native = native_load_event_batch(paths, self.feat_name,
                                         self.max_time, self.feat_dim)
        if native is not None and native[3] == len(paths):
            f, s, l, _ = native
            feats[: len(paths)] = f
            seq_len[: len(paths)] = s
            labels[: len(paths)] = l
        else:
            for i, p in enumerate(paths):
                feats[i], seq_len[i], labels[i] = self._load_event(p)
        return {"features": feats, "seq_len": seq_len, "labels": labels,
                "mask": mask, "num_events": len(paths)}

    def epoch(self):
        from multimodal_similarity_tpu.data.loader import _prefetched

        order = list(self.paths)
        if self.shuffle:
            self.rng.shuffle(order)
        groups = [order[i:i + self.event_per_batch]
                  for i in range(0, len(order), self.event_per_batch)]
        yield from _prefetched(groups, self._make_batch, self.prefetch)
