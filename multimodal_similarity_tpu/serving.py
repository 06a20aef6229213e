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

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.ops.distances import pairwise_distance
from multimodal_similarity_tpu.train.steps import (
    embed_in_chunks, make_embed_fn)


class EmbeddingService:
    """Jitted, padded-batch embedding with a single compilation.

    ``int8=True`` quantizes each request host-side before upload
    (data/device_feed.quantize_features) and dequantizes inline on
    device — quarter of the f32 request bytes on the wire, the serving
    path's governing cost (RESULTS.md "Serving").
    """

    def __init__(self, model, params, batch_size: int = 256,
                 normalized: bool = True, int8: bool = False):
        self.model = model
        self.params = params
        self.batch_size = batch_size
        self.int8 = int8
        # the same jitted eval-mode embed the trainers use — serving must
        # never diverge from training-side embedding semantics
        self._embed = make_embed_fn(model, normalized=normalized)
        self._embed_q = None  # lazily-built quantized-request twin

    def embed(self, events: np.ndarray) -> np.ndarray:
        if events.shape[0] == 0:  # zero-row request: probe the width
            probe = np.asarray(self._embed(
                self.params,
                jnp.zeros((1,) + events.shape[1:], jnp.float32)))
            return np.zeros((0, probe.shape[-1]), np.float32)
        if self.int8:
            from multimodal_similarity_tpu.data.device_feed import (
                quantize_features)
            # NOTE server-side quantization costs a few host passes over
            # the request; on a 1-core host that can eat the wire saving.
            # Wire-bound deployments should quantize CLIENT-side and call
            # embed_quantized directly.
            return self.embed_quantized(*quantize_features(events))
        return embed_in_chunks(self._embed, self.params, events,
                               chunk=self.batch_size)

    def embed_quantized(self, q: np.ndarray,
                        scale: np.ndarray) -> np.ndarray:
        """Embed a pre-quantized request (client-side
        data/device_feed.quantize_features): the int8 payload is a quarter
        of the f32 request bytes on the wire, the serving path's governing
        cost."""
        from multimodal_similarity_tpu.train.steps import (
            dequant_features, embed_arrays_in_chunks)
        if q.shape[0] == 0:  # zero-row request: probe the width
            probe = np.asarray(self._embed(
                self.params, jnp.zeros((1,) + q.shape[1:], jnp.float32)))
            return np.zeros((0, probe.shape[-1]), np.float32)
        if self._embed_q is None:
            embed = self._embed
            # params stay a CALL argument so a hot-swapped checkpoint
            # (svc.params = new) applies to both request paths
            self._embed_q = jax.jit(lambda p, qb, sb: embed(
                p, dequant_features({"q": qb, "scale": sb})))
        fn = lambda qb, sb: self._embed_q(self.params, qb, sb)  # noqa: E731
        return embed_arrays_in_chunks(fn, (q, scale),
                                      chunk=self.batch_size)


class RetrievalIndex:
    """Gallery of embeddings with exact top-k search.

    mesh=None keeps the gallery on the default device; passing a
    jax.sharding.Mesh shards gallery rows across chips and merges
    candidates over ICI.
    """

    def __init__(self, emb_dim: int, metric: str = "euclidean",
                 mesh=None, gallery_chunk: int = 65536,
                 int8_gallery: bool = False):
        self.emb_dim = emb_dim
        self.metric = metric
        self.mesh = mesh
        # int8 gallery rows (g = s * qg, per-row max-abs scale): quarter
        # of the f32 gallery HBM — 4x the rows per chip — and a quarter
        # of the query pass's gallery read.  Distances use the exact
        # scale-factored identity (ops/chunked_topk.py), so the only
        # approximation is the ~0.4%-of-row-norm quantization error;
        # top-k overlap vs the exact index is pinned in
        # tests/test_serving.py.  Euclidean metrics only.
        self.int8_gallery = int8_gallery
        if int8_gallery and metric not in ("euclidean",
                                           "squaredeuclidean"):
            raise NotImplementedError(
                "int8_gallery supports euclidean metrics only")
        # galleries beyond this stream through the chunked scan so the
        # [Q, N] matrix never materializes (ops/chunked_topk.py)
        self.gallery_chunk = gallery_chunk
        # adds accumulate blocks; the gallery concatenates lazily at the
        # first query after adds (incremental building stays O(N))
        self._blocks: List[np.ndarray] = []
        self._n = 0
        self._gallery: Optional[np.ndarray] = None
        # device-resident copy, uploaded once per add() generation — a
        # query must never re-ship the gallery over PCIe/ICI
        self._device_gallery = None
        # quantized artifacts restored by load(): uploaded verbatim, so a
        # reloaded int8 index serves BYTE-identical top-k without ever
        # materializing the f32 gallery
        self._quant = None
        self._meta: list = []

    @staticmethod
    def _quantize_rows(gallery: np.ndarray):
        """Per-row scalar max-abs int8 quantization + exact quantized-row
        squared norms (precomputed once so queries touch only the int8
        matmul)."""
        amax = np.maximum(np.max(np.abs(gallery), axis=1, keepdims=True),
                          1e-12)
        scale = (amax / 127.0).astype(np.float32)
        qg = np.clip(np.rint(gallery / scale), -127, 127).astype(np.int8)
        gsq = ((scale.reshape(-1) ** 2) * np.sum(
            qg.astype(np.float32) ** 2, axis=1)).astype(np.float32)
        return qg, scale, gsq

    def add(self, embeddings: np.ndarray, metadata: Optional[Sequence] = None):
        embeddings = np.asarray(embeddings, np.float32)
        if metadata is not None and len(metadata) != embeddings.shape[0]:
            raise ValueError(
                f"metadata length {len(metadata)} != "
                f"{embeddings.shape[0]} embeddings — metadata would "
                f"silently misalign for every later row")
        if self._quant is not None:
            # extending a loaded int8 index: materialize the dequantized
            # rows as the host gallery first (the artifacts are stale the
            # moment new rows arrive; re-quantization is per-row, so the
            # original rows re-quantize to the same bytes)
            qg, scale, _ = self._quant
            self._blocks = [np.asarray(qg, np.float32)
                            * scale.reshape(-1, 1)]
            self._quant = None
        self._blocks.append(embeddings)
        self._n += embeddings.shape[0]
        self._gallery = None
        self._device_gallery = None  # invalidate; next query re-uploads once
        self._meta.extend(metadata if metadata is not None
                          else [None] * embeddings.shape[0])

    def __len__(self) -> int:
        return self._n

    def _gallery_host(self) -> np.ndarray:
        if self._gallery is None:
            if not self._blocks and self._quant is not None:
                qg, scale, _ = self._quant
                self._blocks = [np.asarray(qg, np.float32)
                                * scale.reshape(-1, 1)]
            self._gallery = (self._blocks[0] if len(self._blocks) == 1
                             else np.concatenate(self._blocks))
            self._blocks = [self._gallery]
        return self._gallery

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> str:
        """Write the index to directory ``path`` (created if needed).

        Layout: manifest.json (shape/metric/config), meta.pkl (metadata
        list), and raw .npy arrays — gallery.npy for f32 indexes;
        q.npy/scale.npy/gsq.npy for int8 indexes (a quarter of the f32
        bytes, and reloaded VERBATIM so a restart serves byte-identical
        top-k without re-embedding or re-quantizing).  .npy arrays load
        back with mmap, so opening a large gallery is O(1).  The closest
        reference analog is evaluate_model.py's results.pkl dump
        (reference :127-134); the reference had no way to persist a
        queryable gallery.
        """
        import json
        import os
        import pickle

        if not len(self):
            raise ValueError("refusing to save an empty gallery")
        os.makedirs(path, exist_ok=True)
        manifest = {
            "format": "msim-retrieval-index", "version": 1,
            "n": int(len(self)), "emb_dim": int(self.emb_dim),
            "metric": self.metric, "int8_gallery": bool(self.int8_gallery),
            "gallery_chunk": int(self.gallery_chunk),
        }

        def save_npy(name, arr):
            # write-to-temp + rename, NEVER truncate in place: when this
            # index was load()ed from ``path`` itself, arr may BE the
            # mmap of the file being written — np.save's 'wb' open would
            # truncate the backing file mid-read (SIGBUS / garbage).
            # os.replace unlinks the old inode, which live mmaps keep
            # reading safely, and makes every artifact crash-atomic.
            tmp = os.path.join(path, name + ".tmp.npy")
            np.save(tmp, arr)
            os.replace(tmp, os.path.join(path, name + ".npy"))

        if self.int8_gallery:
            qg, scale, gsq = (self._quant if self._quant is not None
                              else self._quantize_rows(self._gallery_host()))
            save_npy("q", qg)
            save_npy("scale", np.asarray(scale).reshape(-1))
            save_npy("gsq", gsq)
        else:
            save_npy("gallery", self._gallery_host())
        tmp = os.path.join(path, "meta.pkl.tmp")
        with open(tmp, "wb") as f:
            pickle.dump(self._meta, f)
        os.replace(tmp, os.path.join(path, "meta.pkl"))
        tmp = os.path.join(path, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        # manifest lands last + atomically: a crashed save never yields a
        # directory that load() would accept
        os.replace(tmp, os.path.join(path, "manifest.json"))
        return path

    @classmethod
    def load(cls, path: str, mesh=None,
             gallery_chunk: Optional[int] = None) -> "RetrievalIndex":
        """Reconstruct a saved index; serves top-k identical to the saved
        instance without re-embedding (int8 artifacts upload verbatim).
        ``mesh`` re-shards the gallery at load time — an index saved on
        one topology serves on another."""
        import json
        import os
        import pickle

        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        if manifest.get("format") != "msim-retrieval-index":
            raise ValueError(f"{path!r} is not a saved RetrievalIndex")
        self = cls(emb_dim=manifest["emb_dim"], metric=manifest["metric"],
                   mesh=mesh,
                   gallery_chunk=gallery_chunk or manifest["gallery_chunk"],
                   int8_gallery=manifest["int8_gallery"])
        if manifest["int8_gallery"]:
            self._quant = (
                np.load(os.path.join(path, "q.npy"), mmap_mode="r"),
                np.load(os.path.join(path, "scale.npy"), mmap_mode="r"),
                np.load(os.path.join(path, "gsq.npy"), mmap_mode="r"))
            self._n = int(self._quant[0].shape[0])
        else:
            gallery = np.load(os.path.join(path, "gallery.npy"),
                              mmap_mode="r")
            self._blocks = [gallery]
            self._n = int(gallery.shape[0])
        if self._n != manifest["n"]:
            raise ValueError(
                f"manifest n={manifest['n']} != stored rows {self._n}")
        with open(os.path.join(path, "meta.pkl"), "rb") as f:
            self._meta = pickle.load(f)
        return self

    def _gallery_on_device(self):
        if self._device_gallery is None:
            if self.mesh is not None and not self.int8_gallery:
                gallery = self._pad_for_mesh(self._gallery_host(), fill=1e15)
                from jax.sharding import NamedSharding, PartitionSpec as P
                self._device_gallery = jax.device_put(
                    gallery, NamedSharding(self.mesh, P("data", None)))
            elif self.int8_gallery:
                # load()ed artifacts upload verbatim — the f32 gallery is
                # never materialized on the reload path
                qg, scale, gsq = (self._quant
                                  if self._quant is not None
                                  else self._quantize_rows(
                                      self._gallery_host()))
                # loaded artifacts store scale flat [N]; normalize shape
                scale = np.asarray(scale, np.float32).reshape(-1, 1)
                qg, gsq = np.asarray(qg), np.asarray(gsq, np.float32)
                if self.mesh is not None:
                    from jax.sharding import (
                        NamedSharding, PartitionSpec as P)
                    # pad to a device multiple; padding rows carry
                    # gsq ~ +inf so they never win a local top-k
                    n_pad = (-len(self)) % self.mesh.devices.size
                    if n_pad:
                        qg = np.concatenate(
                            [qg, np.zeros((n_pad, self.emb_dim), np.int8)])
                        scale = np.concatenate(
                            [scale, np.ones((n_pad, 1), np.float32)])
                        gsq = np.concatenate(
                            [gsq, np.full((n_pad,), 1e30, np.float32)])
                    row_s = NamedSharding(self.mesh, P("data"))
                    self._device_gallery = (
                        jax.device_put(qg, NamedSharding(self.mesh,
                                                         P("data", None))),
                        jax.device_put(scale.reshape(-1), row_s),
                        jax.device_put(gsq, row_s))
                else:
                    self._device_gallery = (jax.device_put(qg),
                                            jax.device_put(scale),
                                            jax.device_put(gsq))
            else:
                self._device_gallery = jnp.asarray(self._gallery_host())
        return self._device_gallery

    def _pad_for_mesh(self, gallery: np.ndarray,
                      fill: float) -> np.ndarray:
        pad = (-len(self)) % self.mesh.devices.size
        if pad:
            gallery = np.concatenate(
                [gallery, np.full((pad, self.emb_dim), fill, np.float32)])
        return gallery

    def query(self, queries: np.ndarray, k: int = 10
              ) -> Tuple[np.ndarray, np.ndarray, list]:
        """-> (dists [Q, k], indices [Q, k], metadata nested list).

        A single 1-D query vector is accepted and treated as Q=1."""
        if not len(self):
            raise ValueError("empty gallery")
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        q = jnp.asarray(queries)
        k = min(k, len(self))
        gallery = self._gallery_on_device()
        if self.int8_gallery and self.mesh is not None:
            from multimodal_similarity_tpu.parallel.sharded_eval import (
                sharded_retrieval_topk_quantized)
            qg, scale, gsq = gallery
            d, idx = sharded_retrieval_topk_quantized(
                self.mesh, q, qg, scale, gsq, k=k, metric=self.metric)
        elif self.int8_gallery:
            from multimodal_similarity_tpu.ops.chunked_topk import (
                chunked_topk_quantized)
            qg, scale, gsq = gallery
            d, idx = chunked_topk_quantized(
                q, qg, scale, gsq, k=k,
                chunk=min(self.gallery_chunk, max(4096, len(self))),
                metric=self.metric)
        elif self.mesh is not None:
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
