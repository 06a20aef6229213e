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


def split_bf16_inner(q: jnp.ndarray, g16: jnp.ndarray) -> jnp.ndarray:
    """f32-accurate [Q, d] x [C, d]^T contraction against a bf16 gallery.

    int8 gallery rows are EXACTLY representable in bf16 (integers up to
    127 fit its 8 mantissa bits), so the only rounding in a bf16 MXU
    contraction would be the query cast — enough to flip near-tie
    rankings.  Splitting the f32 query into bf16 hi + lo parts
    (q = hi + lo, |lo| <= 2^-8 |q|) and summing two bf16 matmuls in f32
    carries ~16 query mantissa bits: the query-side error drops below the
    int8 quantization error by ~2^8, restoring the documented contract
    that row quantization is the only meaningful approximation.  Costs a
    second matmul on an op bound by the int8 gallery HBM read.
    """
    qhi = q.astype(jnp.bfloat16)
    qlo = (q - qhi.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot(a):
        return jax.lax.dot_general(a, g16, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    return dot(qhi) + dot(qlo)


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


@functools.partial(jax.jit, static_argnames=("k", "chunk", "metric"))
def chunked_topk_quantized(queries: jnp.ndarray, q_gallery: jnp.ndarray,
                           scale: jnp.ndarray, gsq: jnp.ndarray,
                           k: int = 32,
                           chunk: int = 4096, metric: str = "euclidean"):
    """Streaming top-k over an int8-quantized gallery (rows g = s * qg).

    The gallery HBM read is a quarter of f32; distances use the exact
    identity d^2(x, g) = |x|^2 + s^2 |qg|^2 - 2 s (x . qg), with the
    contraction computed by the split-bf16 scheme (split_bf16_inner) so
    the only meaningful approximation is the row quantization itself
    (|d - d_exact| bounded by the per-row scale — see
    serving.RetrievalIndex(int8_gallery=True)).
    Euclidean metrics only: l1 has no scale-factoring identity.
    """
    if metric not in ("euclidean", "squaredeuclidean"):
        raise NotImplementedError(
            f"int8 gallery supports euclidean metrics, not {metric!r}")
    q = queries.astype(jnp.float32)
    xsq = jnp.sum(q * q, axis=1, keepdims=True)              # [Q, 1]
    n = q_gallery.shape[0]
    pad = (-n) % chunk
    qg = jnp.pad(q_gallery, ((0, pad), (0, 0)))
    s = jnp.pad(scale.reshape(-1).astype(jnp.float32), ((0, pad),))
    gsq_p = jnp.pad(gsq.reshape(-1).astype(jnp.float32), ((0, pad),))
    n_chunks = qg.shape[0] // chunk
    qg_chunks = qg.reshape(n_chunks, chunk, -1)
    s_chunks = s.reshape(n_chunks, chunk)
    gsq_chunks = gsq_p.reshape(n_chunks, chunk)
    valid = (jnp.arange(n + pad) < n).reshape(n_chunks, chunk)
    idx_chunks = jnp.arange(n + pad, dtype=jnp.int32).reshape(n_chunks,
                                                              chunk)
    nq = q.shape[0]
    init = (jnp.full((nq, k), _POS_INF, jnp.float32),
            jnp.full((nq, k), -1, jnp.int32))

    def body(carry, inputs):
        best_d, best_i = carry
        qg_c, s_c, gsq_c, v_c, i_c = inputs
        inner = split_bf16_inner(q, qg_c.astype(jnp.bfloat16))
        d = jnp.maximum(xsq + gsq_c[None, :] - 2.0 * s_c[None, :] * inner,
                        0.0)
        if metric == "euclidean":
            d = jnp.sqrt(d)
        d = jnp.where(v_c[None, :], d, _POS_INF)
        cand_d = jnp.concatenate([best_d, d], axis=1)
        cand_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(i_c[None, :], (nq, chunk))], axis=1)
        neg_top, pos = jax.lax.top_k(-cand_d, k)
        return (-neg_top, jnp.take_along_axis(cand_i, pos, axis=1)), None

    (best_d, best_i), _ = jax.lax.scan(
        body, init, (qg_chunks, s_chunks, gsq_chunks, valid, idx_chunks))
    return best_d, best_i
