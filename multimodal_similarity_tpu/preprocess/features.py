"""Per-frame CNN feature extraction.

Reference: preprocess/feat_extract_ResNetV2.py:10-143 (InceptionResNetV2
conv maps, 8x8x1536 per frame) and feat_extract_GoogleNet.py:10-45
(InceptionV1 1024-d pools) via TF-slim checkpoints.

This build ships no pretrained vision weights (zero-egress image).  The
extractor takes any callable ``embed_fn(batch_uint8 [B, H, W, 3]) ->
features`` — plug in a flax/torch model of your choice — and handles the
frame IO, batching, and per-session .npy writing.  ``torch_backbone``
builds one from torchvision when that optional dependency is present.
"""

from __future__ import annotations

import glob
import os
import sys
from typing import Callable, Sequence

import numpy as np


def _load_frames(frame_dir: str):
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise ImportError("Pillow required to read frames") from e
    paths = sorted(glob.glob(os.path.join(frame_dir, "frame_*.jpg")))
    for p in paths:
        yield np.asarray(Image.open(p).convert("RGB"))


def torch_backbone(name: str = "inception_v3"):  # pragma: no cover
    """Optional torchvision-based embed_fn (requires torchvision +
    downloaded weights)."""
    import torch
    import torchvision

    model = getattr(torchvision.models, name)(weights="DEFAULT")
    model.eval()

    def embed_fn(batch: np.ndarray) -> np.ndarray:
        x = torch.from_numpy(batch).permute(0, 3, 1, 2).float() / 255.0
        with torch.no_grad():
            return model(x).numpy()

    return embed_fn


def extract_session_features(
    frame_dir: str,
    out_path: str,
    embed_fn: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 32,
) -> int:
    feats = []
    batch = []
    for frame in _load_frames(frame_dir):
        batch.append(frame)
        if len(batch) == batch_size:
            feats.append(np.asarray(embed_fn(np.stack(batch))))
            batch = []
    if batch:
        feats.append(np.asarray(embed_fn(np.stack(batch))))
    out = np.concatenate(feats, axis=0).astype(np.float32)
    np.save(out_path, out)
    return out.shape[0]


def extract_sessions(session_ids: Sequence[str], frame_root: str,
                     feature_root: str, embed_fn, suffix: str = ".npy",
                     batch_size: int = 32) -> None:
    os.makedirs(feature_root, exist_ok=True)
    for session_id in session_ids:
        out_path = os.path.join(feature_root, session_id + suffix)
        if os.path.exists(out_path):
            continue
        n = extract_session_features(
            os.path.join(frame_root, session_id), out_path, embed_fn,
            batch_size)
        print(f"{session_id}: {n} frames embedded")


def main(argv=None):  # pragma: no cover
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--frame_root", required=True)
    p.add_argument("--feature_root", required=True)
    p.add_argument("--session_file", required=True)
    p.add_argument("--backbone", default="inception_v3")
    args = p.parse_args(argv)
    with open(args.session_file) as f:
        sessions = f.read().strip().split("\n")
    extract_sessions(sessions, args.frame_root, args.feature_root,
                     torch_backbone(args.backbone))


if __name__ == "__main__":
    main(sys.argv[1:])
