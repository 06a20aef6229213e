"""Streaming top-k retrieval over a chunked gallery.

For galleries too large to materialize the [Q, N] distance matrix in HBM,
scan gallery chunks with a running top-k merge: per chunk one MXU matmul
[Q, d] x [d, C] plus a [Q, k + C] re-sort.  Memory is O(Q * (k + C)),
independent of N.  The multi-chip variant lives in
parallel/sharded_eval.py; this is the single-chip building block each
shard can also use internally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_POS_INF = 1e30


@functools.partial(jax.jit, static_argnames=("k", "chunk", "metric"))
def chunked_topk(queries: jnp.ndarray, gallery: jnp.ndarray, k: int = 32,
                 chunk: int = 4096, metric: str = "euclidean"):
    """-> (dists [Q, k], indices [Q, k]) ascending, exact.

    gallery is padded internally to a chunk multiple; padding rows get +inf
    distance and index -1 (only visible when k > N).
    """
    from multimodal_similarity_tpu.ops.distances import pairwise_distance

    q = queries.astype(jnp.float32)
    n = gallery.shape[0]
    pad = (-n) % chunk
    g = jnp.pad(gallery.astype(jnp.float32), ((0, pad), (0, 0)))
    n_chunks = g.shape[0] // chunk
    g_chunks = g.reshape(n_chunks, chunk, -1)
    valid = (jnp.arange(n + pad) < n).reshape(n_chunks, chunk)
    idx_chunks = jnp.arange(n + pad, dtype=jnp.int32).reshape(n_chunks,
                                                              chunk)
    nq = q.shape[0]
    init = (jnp.full((nq, k), _POS_INF, jnp.float32),
            jnp.full((nq, k), -1, jnp.int32))

    def body(carry, inputs):
        best_d, best_i = carry
        g_c, v_c, i_c = inputs
        d = pairwise_distance(q, g_c, metric)                # [Q, C]
        d = jnp.where(v_c[None, :], d, _POS_INF)
        cand_d = jnp.concatenate([best_d, d], axis=1)        # [Q, k + C]
        cand_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(i_c[None, :], (nq, chunk))], axis=1)
        neg_top, pos = jax.lax.top_k(-cand_d, k)
        return (-neg_top, jnp.take_along_axis(cand_i, pos, axis=1)), None

    (best_d, best_i), _ = jax.lax.scan(body, init,
                                       (g_chunks, valid, idx_chunks))
    return best_d, best_i
