import numpy as np
import jax.numpy as jnp

from multimodal_similarity_tpu.ops import (
    all_diffs, cdist, pairwise_distance, self_distance)


def _np_cdist(a, b, metric):
    diff = a[:, None, :] - b[None, :, :]
    if metric == "squaredeuclidean":
        return np.sum(diff ** 2, axis=-1)
    if metric == "euclidean":
        return np.sqrt(np.sum(diff ** 2, axis=-1) + 1e-12)
    if metric == "l1":
        return np.sum(np.abs(diff), axis=-1)
    raise ValueError


def test_all_diffs_cdist_match_numpy(rng):
    a = rng.randn(7, 5).astype(np.float32)
    b = rng.randn(9, 5).astype(np.float32)
    for metric in ("squaredeuclidean", "euclidean", "l1"):
        got = np.asarray(cdist(all_diffs(jnp.array(a), jnp.array(b)), metric))
        np.testing.assert_allclose(got, _np_cdist(a, b, metric), rtol=1e-5,
                                   atol=1e-5)


def test_pairwise_distance_matches_exact(rng):
    a = rng.randn(33, 17).astype(np.float32)
    b = rng.randn(21, 17).astype(np.float32)
    for metric in ("squaredeuclidean", "euclidean", "l1"):
        got = np.asarray(pairwise_distance(jnp.array(a), jnp.array(b), metric))
        np.testing.assert_allclose(got, _np_cdist(a, b, metric), rtol=1e-4,
                                   atol=1e-4)


def test_self_distance_zero_diagonal(rng):
    a = rng.randn(16, 8).astype(np.float32)
    d = np.asarray(self_distance(jnp.array(a)))
    np.testing.assert_allclose(np.diag(d), 0.0)
    np.testing.assert_allclose(d, d.T, rtol=1e-5, atol=1e-5)


def test_pairwise_distance_nonnegative(rng):
    # near-duplicate rows stress the Gram-expansion cancellation
    a = rng.randn(10, 4).astype(np.float32)
    a = np.concatenate([a, a + 1e-7], axis=0)
    d = np.asarray(pairwise_distance(jnp.array(a), jnp.array(a)))
    assert (d >= 0).all()
