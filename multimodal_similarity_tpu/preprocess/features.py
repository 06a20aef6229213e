"""Per-frame CNN feature extraction.

Reference: preprocess/feat_extract_ResNetV2.py:10-143 (InceptionResNetV2
conv maps, 8x8x1536 per frame) and feat_extract_GoogleNet.py:10-45
(InceptionV1 1024-d pools) via TF-slim checkpoints, plus the Stanford40
word2vec text features (feat_extract_ResNetV2.py:84-107).

``flax_backbone`` runs the in-repo architecture-exact towers
(models/inception_resnet_v2.py, models/inception_v1.py) with the
reference's exact preprocessing (uint8 -> [0,1] -> bilinear resize ->
[-1,1]); pass ``slim_checkpoint=`` (.npz of slim variable names ->
arrays) to reproduce the reference features bit-for-architecture — this
zero-egress build bundles no pretrained weights, so without it the
towers run at random init (pipeline-shape-correct).  ``embed_fn`` stays
pluggable for any other callable ``(batch_uint8 [B, H, W, 3]) ->
features``; ``torch_backbone`` builds one from torchvision when that
optional dependency is present.
"""

from __future__ import annotations

import glob
import os
import sys
from typing import Callable, Dict, Optional, Sequence

import numpy as np


def _load_frames(frame_dir: str):
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise ImportError("Pillow required to read frames") from e
    paths = sorted(glob.glob(os.path.join(frame_dir, "frame_*.jpg")))
    for p in paths:
        yield np.asarray(Image.open(p).convert("RGB"))


def flax_backbone(name: str = "inception_resnet_v2",
                  slim_checkpoint: Optional[str] = None,
                  image_size: Optional[int] = None,
                  batch_pad: bool = True,
                  pipeline_stages: int = 0,
                  pipeline_microbatch: int = 8,
                  frame_shape: Optional[tuple] = None) -> Callable:
    """embed_fn running the in-repo slim-exact towers on device.

    name: ``inception_resnet_v2`` -> [B, 8, 8, 1536] conv maps at 299
    input (the Honda 'resnet' feature contract, base_config.py:51);
    ``inception_v1`` -> [B, 1024] pools at 224 (the CUB/Stanford40
    feature contract).  Preprocessing matches the reference exactly:
    uint8 -> /255 -> bilinear resize -> (x - 0.5) * 2.

    ``pipeline_stages > 1`` stage-splits the InceptionResNetV2 trunk over
    that many devices (parallel/pipeline.py): each device holds ~1/S of
    the tower and microbatches stream through the stages concurrently.
    """
    import jax
    import jax.numpy as jnp

    if name == "inception_resnet_v2":
        from multimodal_similarity_tpu.models.inception_resnet_v2 import (
            InceptionResNetV2)
        model, size, prefix = InceptionResNetV2(), 299, "InceptionResnetV2"
    elif name == "inception_v1":
        from multimodal_similarity_tpu.models.inception_v1 import InceptionV1
        model, size, prefix = InceptionV1(), 224, "InceptionV1"
    else:
        raise NotImplementedError(f"unknown flax backbone: {name}")
    size = image_size or size

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)))
    if slim_checkpoint:
        from multimodal_similarity_tpu.models.slim_graft import graft_slim_npz
        variables = graft_slim_npz(variables, slim_checkpoint, prefix)

    def _pre(batch):
        x = batch.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, (x.shape[0], size, size, 3), "bilinear")
        return (x - 0.5) * 2.0

    if pipeline_stages > 1:
        if name != "inception_resnet_v2":
            raise NotImplementedError(
                "pipeline_stages requires the unit-segmented "
                "inception_resnet_v2 trunk")
        from multimodal_similarity_tpu.models.inception_resnet_v2 import (
            N_PIPELINE_UNITS)
        from multimodal_similarity_tpu.parallel.pipeline import (
            INCEPTION_RESNET_V2_UNIT_COSTS, PipelinedBackbone)
        # frames enter at the camera's native size (frame_shape); the
        # uint8 -> resize -> scale preprocessing fuses into stage 0's
        # program so raw bytes, not f32, ride the wire
        h, w = frame_shape or (size, size)
        return PipelinedBackbone(
            model, variables, n_units=N_PIPELINE_UNITS,
            input_shape=(h, w, 3), n_stages=pipeline_stages,
            microbatch=pipeline_microbatch,
            unit_costs=INCEPTION_RESNET_V2_UNIT_COSTS,
            preprocess=_pre, input_dtype=jnp.uint8)

    @jax.jit
    def forward(batch):
        return model.apply(variables, _pre(batch))

    def embed_fn(batch: np.ndarray) -> np.ndarray:
        n = batch.shape[0]
        if batch_pad:
            # pad to the next power of two: one compiled program per
            # bucket instead of one per ragged tail size
            m = 1
            while m < n:
                m *= 2
            if m != n:
                batch = np.concatenate(
                    [batch, np.zeros((m - n,) + batch.shape[1:],
                                     batch.dtype)])
        return np.asarray(forward(jnp.asarray(batch)))[:n]

    return embed_fn


def text_features(phrases: Sequence[str],
                  word_vectors: Dict[str, np.ndarray],
                  counts: Optional[Sequence[int]] = None,
                  dim: int = 300,
                  noise: float = 0.01,
                  rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """word2vec-style text features for underscore-joined label phrases.

    Reference (Stanford40 side-track, feat_extract_ResNetV2.py:98-107):
    mean word vector over the phrase's in-vocabulary words, tiled per
    image with +/- noise/2 uniform jitter.  ``word_vectors`` is any
    word -> vector mapping (e.g. a loaded embedding table); words missing
    from it are skipped, and a phrase with no known words gets zeros.
    """
    rng = rng or np.random.RandomState(0)
    counts = counts if counts is not None else [1] * len(phrases)
    rows = []
    for phrase, count in zip(phrases, counts):
        vecs = [np.asarray(word_vectors[w], np.float32).reshape(-1)
                for w in phrase.split("_") if w in word_vectors]
        mean = (np.mean(vecs, axis=0) if vecs
                else np.zeros(dim, np.float32))
        tiled = np.tile(mean.reshape(1, -1), (count, 1))
        rows.append(tiled + (rng.rand(count, mean.shape[0]) - 0.5) * noise)
    return np.concatenate(rows, axis=0).astype(np.float32)


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
    if not feats:
        raise FileNotFoundError(
            f"no frame_*.jpg in {frame_dir!r} — did frame extraction "
            f"(preprocess.frames) run for this session?")
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
        try:
            n = extract_session_features(
                os.path.join(frame_root, session_id), out_path, embed_fn,
                batch_size)
        except FileNotFoundError as e:
            # one frameless session shouldn't abort the batch run —
            # mirror frames.py's "no video for <session>, skipping"
            print(f"{session_id}: {e}; skipping")
            continue
        print(f"{session_id}: {n} frames embedded")


def main(argv=None):  # pragma: no cover
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--frame_root", required=True)
    p.add_argument("--feature_root", required=True)
    p.add_argument("--session_file", required=True)
    p.add_argument("--backbone", default="inception_resnet_v2",
                   help="inception_resnet_v2 | inception_v1 | a "
                        "torchvision model name")
    p.add_argument("--slim_checkpoint", default=None,
                   help=".npz of slim variable names -> arrays")
    p.add_argument("--pipeline_stages", type=int, default=0,
                   help="stage-split the inception_resnet_v2 trunk over "
                        "this many devices (pipeline parallelism; 0/1 = "
                        "single-device)")
    def _hxw(s):
        parts = s.lower().split("x")
        try:
            h, w = (int(v) for v in parts)
        except ValueError:
            raise argparse.ArgumentTypeError(
                f"expected HxW (e.g. 480x640), got {s!r}")
        return (h, w)

    p.add_argument("--frame_shape", type=_hxw, default=None,
                   help="native HxW of the stored frames, e.g. 480x640 "
                        "(pipeline mode compiles for one fixed input "
                        "shape)")
    args = p.parse_args(argv)
    with open(args.session_file) as f:
        sessions = f.read().strip().split("\n")
    if args.backbone in ("inception_resnet_v2", "inception_v1"):
        embed_fn = flax_backbone(args.backbone, args.slim_checkpoint,
                                 pipeline_stages=args.pipeline_stages,
                                 frame_shape=args.frame_shape)
    else:
        embed_fn = torch_backbone(args.backbone)
    extract_sessions(sessions, args.frame_root, args.feature_root,
                     embed_fn)


if __name__ == "__main__":
    main(sys.argv[1:])
