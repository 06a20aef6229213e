"""Serving-path throughput/latency on the available accelerator.

Measures the two serving primitives at production-like sizes:
- EmbeddingService.embed QPS for ConvRTSN at Honda video dims (the
  serving counterpart of the trainer's eval-mode embed path);
- RetrievalIndex.query latency/QPS against a large gallery (exact
  top-k; beyond ``gallery_chunk`` rows the chunked scan streams the
  gallery so the [Q, N] matrix never materializes).

Recorded in RESULTS.md "serving".  Usage:
    python scripts/bench_serving.py [gallery_size [emb_dim]]
"""
import os
import sys
import time

import numpy as np

# runnable as `python scripts/bench_serving.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(gallery_n=200_000, emb_dim=256):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.serving import (
        EmbeddingService, RetrievalIndex)

    print(f"backend {jax.default_backend()}", file=sys.stderr, flush=True)
    rng = np.random.RandomState(0)

    # --- embedding service at Honda video dims -------------------------
    model = build_encoder("convrtsn", num_seg=3, emb_dim=emb_dim,
                          n_input=1536, n_h=8, n_w=8, n_C=20)
    x_init = jnp.asarray(rng.randn(2, 3, 8, 8, 1536).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x_init)["params"]
    svc = EmbeddingService(model, params, batch_size=256)

    req = rng.randn(256, 3, 8, 8, 1536).astype(np.float32)
    svc.embed(req[:2])  # compile
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        out = svc.embed(req)
        best = max(best, req.shape[0] / (time.time() - t0))
    print(f"embed: {best:8.1f} events/s (256-event request, host in/out, "
          f"includes both transfers)", flush=True)

    # --- retrieval index -----------------------------------------------
    gallery = rng.randn(gallery_n, emb_dim).astype(np.float32)
    gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
    index = RetrievalIndex(emb_dim, metric="euclidean")
    index.add(gallery)

    for q_batch in (1, 64, 1024):
        queries = rng.randn(q_batch, emb_dim).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        index.query(queries, k=10)  # compile + gallery upload
        best_lat, best_qps = 1e30, 0.0
        for _ in range(3):
            t0 = time.time()
            index.query(queries, k=10)
            dt = time.time() - t0
            best_lat = min(best_lat, dt)
            best_qps = max(best_qps, q_batch / dt)
        print(f"query: gallery={gallery_n} Q={q_batch:5d} k=10  "
              f"{best_lat * 1000:8.2f} ms  {best_qps:10.1f} queries/s",
              flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 200_000,
         int(args[1]) if len(args) > 1 else 256)
