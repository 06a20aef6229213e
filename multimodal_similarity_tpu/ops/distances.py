"""Pairwise-distance math.

Reference semantics: ``all_diffs`` / ``cdist`` in
``/root/reference/src/utils.py:302-360`` (broadcasted difference tensor plus a
metric reduction).  On TPU the O(N^2 d) difference tensor is HBM-hostile, so
the primary entry point here is :func:`pairwise_distance`, which computes the
same distances through a single MXU matmul (Gram-matrix expansion) and never
materializes the [N, M, d] tensor.  ``all_diffs``/``cdist`` are kept for
small-batch parity and for the `l1` metric, which has no matmul form.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12  # matches the reference's sqrt epsilon (utils.py:337,356)


def all_diffs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All pairwise differences a[i] - b[j] -> [N, M, d].

    Reference: ``all_diffs`` at utils.py:313-322.  O(N*M*d) memory — use only
    for small batches or the l1 metric.
    """
    return a[:, None, :] - b[None, :, :]


def all_pairs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All (a_i, b_j) combinations stacked pairwise -> [N*M, 2, d].

    Reference: ``all_pairs_tf`` at utils.py:290-299 (pair-tensor builder
    feeding the pair heads)."""
    n, d = a.shape
    m = b.shape[0]
    aa = jnp.broadcast_to(a[:, None, :], (n, m, d)).reshape(-1, 1, d)
    bb = jnp.broadcast_to(b[None, :, :], (n, m, d)).reshape(-1, 1, d)
    return jnp.concatenate([aa, bb], axis=1)


def cdist(diff: jnp.ndarray, metric: str = "squaredeuclidean") -> jnp.ndarray:
    """Reduce a difference tensor to distances along the last axis.

    Reference: ``cdist`` at utils.py:324-341.
    """
    if metric == "squaredeuclidean":
        return jnp.sum(jnp.square(diff), axis=-1)
    if metric == "euclidean":
        return jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1) + _EPS)
    if metric == "l1":
        return jnp.sum(jnp.abs(diff), axis=-1)
    raise NotImplementedError(f"unknown metric: {metric}")


def pairwise_distance(
    a: jnp.ndarray,
    b: jnp.ndarray,
    metric: str = "squaredeuclidean",
) -> jnp.ndarray:
    """[N, d] x [M, d] -> [N, M] distances without the O(N*M*d) intermediate.

    squared-euclidean / euclidean route through one matmul
    (|a|^2 + |b|^2 - 2 a.b) so XLA tiles the contraction onto the MXU; the
    result is clamped at zero to absorb the cancellation error of the Gram
    expansion.  l1 has no matmul form and falls back to the broadcasted
    difference.
    """
    if metric == "l1":
        return cdist(all_diffs(a, b), "l1")

    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    sq_a = jnp.sum(jnp.square(a), axis=-1)  # [N]
    sq_b = jnp.sum(jnp.square(b), axis=-1)  # [M]
    inner = jnp.dot(a, b.T, preferred_element_type=jnp.float32)  # [N, M]
    sq = jnp.maximum(sq_a[:, None] + sq_b[None, :] - 2.0 * inner, 0.0)

    if metric == "squaredeuclidean":
        return sq
    if metric == "euclidean":
        return jnp.sqrt(sq + _EPS)
    raise NotImplementedError(f"unknown metric: {metric}")


def self_distance(a: jnp.ndarray, metric: str = "squaredeuclidean") -> jnp.ndarray:
    """[N, d] -> [N, N] self-distance matrix (zero diagonal for sq-euclidean)."""
    d = pairwise_distance(a, a, metric)
    if metric == "squaredeuclidean":
        # the Gram expansion can leave tiny positive values on the diagonal
        d = d * (1.0 - jnp.eye(d.shape[0], dtype=d.dtype))
    return d
