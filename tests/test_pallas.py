"""Pallas kernels vs dense XLA oracles (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_similarity_tpu.ops.distances import self_distance, pairwise_distance
from multimodal_similarity_tpu.ops.losses import batch_hard
from multimodal_similarity_tpu.ops.pallas import (
    batch_hard_pallas, fused_batch_hard_stats, pallas_sqdist)


def _clustered(rng, n=70, n_classes=5, dim=24):
    labels = rng.randint(0, n_classes, size=n)
    centers = rng.randn(n_classes, dim)
    emb = (centers[labels] + 0.8 * rng.randn(n, dim)).astype(np.float32)
    return jnp.array(emb), jnp.array(labels)


def test_pallas_sqdist_matches_dense(rng):
    a = jnp.array(rng.randn(70, 24).astype(np.float32))
    b = jnp.array(rng.randn(50, 24).astype(np.float32))
    got = np.asarray(pallas_sqdist(a, b, block_m=32, block_n=32))
    want = np.asarray(pairwise_distance(a, b, "squaredeuclidean"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_stats_match_dense(rng):
    emb, labels = _clustered(rng)
    fp, cn, nc = fused_batch_hard_stats(emb, labels, None, 32, "f32")
    dists = self_distance(emb)
    same = np.asarray(labels)[:, None] == np.asarray(labels)[None, :]
    pos_m = same & ~np.eye(70, dtype=bool)
    neg_m = ~same
    d = np.asarray(dists)
    want_fp = (d * pos_m).max(axis=1)
    want_cn = np.where(neg_m, d, 1e30).min(axis=1)
    np.testing.assert_allclose(np.asarray(fp), want_fp, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cn), want_cn, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nc), neg_m.sum(1))


def test_fused_stats_respects_valid_mask(rng):
    emb, labels = _clustered(rng, n=40)
    valid = jnp.array((np.arange(40) < 30).astype(np.float32))
    fp, cn, nc = fused_batch_hard_stats(emb, labels, valid, 16, "f32")
    d = np.asarray(self_distance(emb))
    lab = np.asarray(labels)
    same = lab[:, None] == lab[None, :]
    pos_m = same & ~np.eye(40, dtype=bool) & (np.arange(40) < 30)[None, :]
    neg_m = ~same & (np.arange(40) < 30)[None, :]
    np.testing.assert_allclose(np.asarray(fp), (d * pos_m).max(1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cn),
                               np.where(neg_m, d, 1e30).min(1),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("margin", ["soft", 0.5])
def test_batch_hard_pallas_matches_reference_loss(rng, margin):
    emb, labels = _clustered(rng, n=60)
    labels = labels.at[:3].set(1)
    dists = self_distance(emb)
    want = batch_hard(dists, labels.astype(jnp.float32), margin, True)
    got = batch_hard_pallas(emb, labels, margin, True, block=32, precision="f32")
    np.testing.assert_allclose(float(got[0]), float(want[0]), rtol=1e-4)
    np.testing.assert_allclose(float(got[1]), float(want[1]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got[4]), np.asarray(want[4]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[5]), np.asarray(want[5]),
                               rtol=1e-4, atol=1e-4)


def test_batch_hard_pallas_gradients_match(rng):
    emb, labels = _clustered(rng, n=48, dim=16)
    labels = labels.at[:3].set(1)

    def loss_dense(e):
        return batch_hard(self_distance(e), labels.astype(jnp.float32),
                          "soft", True)[0]

    def loss_pallas(e):
        return batch_hard_pallas(e, labels, "soft", True, block=16, precision="f32")[0]

    g_dense = jax.grad(loss_dense)(emb)
    g_pallas = jax.grad(loss_pallas)(emb)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_dense),
                               rtol=1e-3, atol=1e-5)


def test_batch_hard_pallas_nonaligned_n(rng):
    # n not a multiple of the block: padding path
    emb, labels = _clustered(rng, n=37, dim=8)
    labels = labels.at[:3].set(1)
    got = batch_hard_pallas(emb, labels, 0.3, True, block=16, precision="f32")
    want = batch_hard(self_distance(emb), labels.astype(jnp.float32),
                      0.3, True)
    np.testing.assert_allclose(float(got[0]), float(want[0]), rtol=1e-4)


def test_fused_stats_bf16_close(rng):
    """Default bf16 matmul stays within bf16 tolerance of the exact stats."""
    emb, labels = _clustered(rng, n=64)
    fp16, cn16, _ = fused_batch_hard_stats(emb, labels, None, 32, "bf16")
    fp32, cn32, _ = fused_batch_hard_stats(emb, labels, None, 32, "f32")
    np.testing.assert_allclose(np.asarray(fp16), np.asarray(fp32),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(cn16), np.asarray(cn32),
                               rtol=5e-2, atol=5e-2)


def _dense_stats(emb, labels, valid=None):
    n = emb.shape[0]
    d = np.asarray(self_distance(emb))
    lab = np.asarray(labels)
    same = lab[:, None] == lab[None, :]
    colmask = np.ones(n, bool) if valid is None else np.asarray(valid) > 0
    pos_m = same & ~np.eye(n, dtype=bool) & colmask[None, :]
    neg_m = ~same & colmask[None, :]
    return (d * pos_m).max(1), np.where(neg_m, d, 1e30).min(1), neg_m.sum(1)


@pytest.mark.parametrize("n", [70, 64])
def test_tri_stats_match_dense(rng, n):
    emb, labels = _clustered(rng, n=n)
    fp, cn, nc = fused_batch_hard_stats(emb, labels, None, 16, "f32", "tri")
    want_fp, want_cn, want_nc = _dense_stats(emb, labels)
    np.testing.assert_allclose(np.asarray(fp), want_fp, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cn), want_cn, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nc), want_nc)


def test_tri_stats_respect_valid_mask(rng):
    emb, labels = _clustered(rng, n=70)
    valid = jnp.array((np.arange(70) < 53).astype(np.float32))
    fp, cn, nc = fused_batch_hard_stats(emb, labels, valid, 16, "f32", "tri")
    want_fp, want_cn, want_nc = _dense_stats(emb, labels, valid)
    np.testing.assert_allclose(np.asarray(fp), want_fp, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cn), want_cn, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nc), want_nc)


def test_tri_loss_and_gradients_match_dense(rng):
    emb, labels = _clustered(rng, n=70, dim=16)
    labels = labels.at[:3].set(1)
    want = batch_hard(self_distance(emb), labels.astype(jnp.float32),
                      "soft", True)
    got = batch_hard_pallas(emb, labels, "soft", True, block=16,
                            precision="f32", algo="tri")
    np.testing.assert_allclose(float(got[0]), float(want[0]), rtol=1e-4)
    np.testing.assert_allclose(float(got[1]), float(want[1]), rtol=1e-4)

    def loss_dense(e):
        return batch_hard(self_distance(e), labels.astype(jnp.float32),
                          "soft", True)[0]

    def loss_tri(e):
        return batch_hard_pallas(e, labels, "soft", True, block=16,
                                 precision="f32", algo="tri")[0]

    g_dense = jax.grad(loss_dense)(emb)
    g_tri = jax.grad(loss_tri)(emb)
    np.testing.assert_allclose(np.asarray(g_tri), np.asarray(g_dense),
                               rtol=1e-3, atol=1e-5)


def test_tri_bf16_close_to_f32(rng):
    emb, labels = _clustered(rng, n=80)
    fp16, cn16, _ = fused_batch_hard_stats(emb, labels, None, 16, "bf16",
                                           "tri")
    fp32, cn32, _ = fused_batch_hard_stats(emb, labels, None, 16, "f32",
                                           "tri")
    np.testing.assert_allclose(np.asarray(fp16), np.asarray(fp32),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(cn16), np.asarray(cn32),
                               rtol=5e-2, atol=5e-2)


def test_tri_auto_dispatch(rng):
    # auto gates tri on d >= 512 and >= 4 tiles; whichever kernel it
    # picks must match the oracle
    emb, labels = _clustered(rng, n=70)
    want_fp, want_cn, _ = _dense_stats(emb, labels)
    fp, cn, _ = fused_batch_hard_stats(emb, labels, None, 16, "f32", "auto")
    np.testing.assert_allclose(np.asarray(fp), want_fp, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cn), want_cn, rtol=1e-4, atol=1e-4)


def test_fused_lifted_matches_dense(rng):
    from multimodal_similarity_tpu.ops.losses import lifted_loss
    from multimodal_similarity_tpu.ops.pallas.lifted import (
        fused_lifted_stats, lifted_loss_pallas)
    emb, labels = _clustered(rng, n=60)
    labels = labels.at[:3].set(1)
    fp, cn, nc = fused_lifted_stats(emb, labels, None, 0.5, 32)
    want = lifted_loss(self_distance(emb), labels.astype(jnp.float32), 0.5)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(want[4]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(want[5]),
                               rtol=1e-4, atol=1e-4)
    got = lifted_loss_pallas(emb, labels, 0.5, True, block=32)
    np.testing.assert_allclose(float(got[0]), float(want[0]), rtol=1e-4)


def test_fused_lifted_gradients_match(rng):
    from multimodal_similarity_tpu.ops.losses import lifted_loss
    from multimodal_similarity_tpu.ops.pallas.lifted import (
        lifted_loss_pallas)
    emb, labels = _clustered(rng, n=48, dim=16)
    labels = labels.at[:3].set(1)

    def dense(e):
        return lifted_loss(self_distance(e), labels.astype(jnp.float32),
                           0.5, True)[0]

    def fused(e):
        return lifted_loss_pallas(e, labels, 0.5, True, block=16)[0]

    g1 = jax.grad(dense)(emb)
    g2 = jax.grad(fused)(emb)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=2e-3,
                               atol=1e-5)


def test_fused_lifted_nonaligned_and_masked(rng):
    from multimodal_similarity_tpu.ops.losses import lifted_loss
    from multimodal_similarity_tpu.ops.pallas.lifted import (
        lifted_loss_pallas)
    emb, labels = _clustered(rng, n=37, dim=8)
    labels = labels.at[:3].set(1)
    got = lifted_loss_pallas(emb, labels, 0.5, True, block=16)
    want = lifted_loss(self_distance(emb), labels.astype(jnp.float32), 0.5)
    np.testing.assert_allclose(float(got[0]), float(want[0]), rtol=1e-4)
    # masked version: padding rows excluded everywhere
    valid = jnp.array((np.arange(37) < 30).astype(np.float32))
    got_m = lifted_loss_pallas(emb, labels, 0.5, True, valid=valid,
                               block=16)
    want_m = lifted_loss(self_distance(emb[:30]),
                         labels[:30].astype(jnp.float32), 0.5)
    np.testing.assert_allclose(float(got_m[0]), float(want_m[0]), rtol=1e-4)


def test_lifted_pallas_bf16_close(rng):
    from multimodal_similarity_tpu.ops.pallas.lifted import lifted_loss_pallas

    emb = jnp.asarray(rng.randn(48, 16).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, size=48))
    ref = lifted_loss_pallas(emb, labels, 0.5, True, block=16)
    got = lifted_loss_pallas(emb, labels, 0.5, True, block=16,
                             precision="bf16")
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-2)
    g_ref = jax.grad(lambda e: lifted_loss_pallas(
        e, labels, 0.5, True, block=16)[0])(emb)
    g_16 = jax.grad(lambda e: lifted_loss_pallas(
        e, labels, 0.5, True, block=16, precision="bf16")[0])(emb)
    assert float(jnp.max(jnp.abs(g_16 - g_ref))) < 5e-2


def _normed(e):
    return e / jnp.linalg.norm(e, axis=1, keepdims=True)


def test_lifted_tri_bounded_matches_dense(rng):
    """The triangular no-max-tracking forward (bounded=True, for
    l2-normalized embeddings) must match the dense oracle and the row
    kernel exactly — including masked padding rows, non-aligned N, and
    the exp(0) non-positive quirk."""
    from multimodal_similarity_tpu.ops.losses import lifted_loss
    from multimodal_similarity_tpu.ops.pallas.lifted import (
        fused_lifted_stats, lifted_loss_pallas)

    emb, labels = _clustered(rng, n=60)
    emb = _normed(emb)
    labels = labels.at[:3].set(1)
    fp, cn, nc = fused_lifted_stats(emb, labels, None, 0.5, 16, "f32", True)
    want = lifted_loss(self_distance(emb), labels.astype(jnp.float32), 0.5)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(want[4]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(want[5]),
                               rtol=1e-4, atol=1e-4)
    # row-kernel agreement
    fp_r, cn_r, nc_r = fused_lifted_stats(emb, labels, None, 0.5, 16,
                                          "f32", False)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fp_r), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(cn_r), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(nc), np.asarray(nc_r))

    # masked + non-aligned
    emb2, labels2 = _clustered(rng, n=37, dim=8)
    emb2 = _normed(emb2)
    valid = jnp.array((np.arange(37) < 30).astype(np.float32))
    got_m = lifted_loss_pallas(emb2, labels2, 0.5, True, valid=valid,
                               block=16, bounded=True)
    want_m = lifted_loss(self_distance(emb2[:30]),
                         labels2[:30].astype(jnp.float32), 0.5)
    np.testing.assert_allclose(float(got_m[0]), float(want_m[0]), rtol=1e-4)


def test_lifted_tri_bounded_gradients_match(rng):
    from multimodal_similarity_tpu.ops.losses import lifted_loss
    from multimodal_similarity_tpu.ops.pallas.lifted import (
        lifted_loss_pallas)

    emb, labels = _clustered(rng, n=48, dim=16)
    emb = _normed(emb)
    labels = labels.at[:3].set(1)

    def dense(e):
        return lifted_loss(self_distance(e), labels.astype(jnp.float32),
                           0.5, True)[0]

    def tri(e):
        return lifted_loss_pallas(e, labels, 0.5, True, block=16,
                                  bounded=True)[0]

    g1 = jax.grad(dense)(emb)
    g2 = jax.grad(tri)(emb)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=2e-3,
                               atol=1e-5)


def test_fused_stats_large_label_ids(rng):
    """Integer ids >= 2^24 (hashed track ids) must stay distinct — labels
    are sort-ranked to dense f32 ids before streaming, so adjacent huge
    ids no longer collide in the f32 cast."""
    n, d = 96, 32
    emb = jnp.asarray(rng.randn(n, d).astype(np.float32))
    small = np.array([1, 2, 3] * (n // 3), np.int64)
    huge = (small + (1 << 26)).astype(np.int64)
    # pre-fix these all round to the same f32 value (spacing 8 at 2^26)
    assert len({float(np.float32(v)) for v in [huge[0], huge[1], huge[2]]}) == 1
    fp_s, cn_s, nc_s = fused_batch_hard_stats(emb, jnp.asarray(small),
                                              precision="f32")
    fp_h, cn_h, nc_h = fused_batch_hard_stats(emb, jnp.asarray(huge),
                                              precision="f32")
    np.testing.assert_allclose(np.asarray(fp_s), np.asarray(fp_h))
    np.testing.assert_allclose(np.asarray(cn_s), np.asarray(cn_h))
    np.testing.assert_allclose(np.asarray(nc_s), np.asarray(nc_h))
