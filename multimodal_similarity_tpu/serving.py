"""Serving: embed events and query a retrieval gallery.

The deployment-side counterpart of the training stack: load a trained
checkpoint, embed incoming events with a fixed-shape jitted forward (one
compile), and run nearest-neighbor queries against a gallery that is
either resident on one chip or sharded across the mesh
(parallel/sharded_eval.py).  The reference had no serving path — retrieval
only existed inside evaluation scripts (evaluate_model.py) — so this is a
new first-class component.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.ops.distances import pairwise_distance
from multimodal_similarity_tpu.train.steps import l2_normalize


class EmbeddingService:
    """Jitted, padded-batch embedding with a single compilation."""

    def __init__(self, model, params, batch_size: int = 256,
                 normalized: bool = True):
        self.model = model
        self.params = params
        self.batch_size = batch_size

        @jax.jit
        def _embed(params, x):
            e = model.apply({"params": params}, x)
            return l2_normalize(e) if normalized else e

        self._embed = _embed

    def embed(self, events: np.ndarray) -> np.ndarray:
        n = events.shape[0]
        out = []
        for start in range(0, n, self.batch_size):
            block = events[start:start + self.batch_size]
            pad = self.batch_size - block.shape[0]
            if pad:
                block = np.concatenate(
                    [block, np.zeros((pad,) + block.shape[1:],
                                     block.dtype)])
            emb = np.asarray(self._embed(self.params, jnp.asarray(block)))
            out.append(emb[: self.batch_size - pad or None])
        return np.concatenate(out, axis=0)[:n]


class RetrievalIndex:
    """Gallery of embeddings with exact top-k search.

    mesh=None keeps the gallery on the default device; passing a
    jax.sharding.Mesh shards gallery rows across chips and merges
    candidates over ICI.
    """

    def __init__(self, emb_dim: int, metric: str = "euclidean",
                 mesh=None, gallery_chunk: int = 65536):
        self.emb_dim = emb_dim
        self.metric = metric
        self.mesh = mesh
        # galleries beyond this stream through the chunked scan so the
        # [Q, N] matrix never materializes (ops/chunked_topk.py)
        self.gallery_chunk = gallery_chunk
        self._gallery: Optional[np.ndarray] = None
        # device-resident copy, uploaded once per add() generation — a
        # query must never re-ship the gallery over PCIe/ICI
        self._device_gallery = None
        self._meta: list = []

    def add(self, embeddings: np.ndarray, metadata: Optional[Sequence] = None):
        embeddings = np.asarray(embeddings, np.float32)
        if self._gallery is None:
            self._gallery = embeddings
        else:
            self._gallery = np.concatenate([self._gallery, embeddings])
        self._device_gallery = None  # invalidate; next query re-uploads once
        self._meta.extend(metadata if metadata is not None
                          else [None] * embeddings.shape[0])

    def __len__(self) -> int:
        return 0 if self._gallery is None else self._gallery.shape[0]

    def _gallery_on_device(self):
        if self._device_gallery is None:
            gallery = self._gallery
            if self.mesh is not None:
                n_dev = self.mesh.devices.size
                pad = (-len(self)) % n_dev
                if pad:
                    gallery = np.concatenate(
                        [gallery,
                         np.full((pad, self.emb_dim), 1e15, np.float32)])
                from jax.sharding import NamedSharding, PartitionSpec as P
                self._device_gallery = jax.device_put(
                    gallery, NamedSharding(self.mesh, P("data", None)))
            else:
                self._device_gallery = jnp.asarray(gallery)
        return self._device_gallery

    def query(self, queries: np.ndarray, k: int = 10
              ) -> Tuple[np.ndarray, np.ndarray, list]:
        """-> (dists [Q, k], indices [Q, k], metadata nested list)."""
        if self._gallery is None or not len(self):
            raise ValueError("empty gallery")
        q = jnp.asarray(queries, jnp.float32)
        k = min(k, len(self))
        gallery = self._gallery_on_device()
        if self.mesh is not None:
            from multimodal_similarity_tpu.parallel import (
                sharded_retrieval_topk)
            d, idx = sharded_retrieval_topk(
                self.mesh, q, gallery, k=k, metric=self.metric)
        elif len(self) > self.gallery_chunk:
            from multimodal_similarity_tpu.ops.chunked_topk import (
                chunked_topk)
            d, idx = chunked_topk(q, gallery, k=k,
                                  chunk=self.gallery_chunk,
                                  metric=self.metric)
        else:
            dmat = pairwise_distance(q, gallery, self.metric)
            neg, idx = jax.lax.top_k(-dmat, k)
            d = -neg
        d = np.asarray(d)
        idx = np.asarray(idx)
        meta = [[self._meta[j] if j < len(self._meta) else None
                 for j in row] for row in idx]
        return d, idx, meta
