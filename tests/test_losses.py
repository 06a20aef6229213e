import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_similarity_tpu.ops import (
    batch_hard,
    classification_loss,
    dcca_loss,
    lifted_loss,
    npairs_loss,
    triplet_loss,
    triplet_loss_masked,
    triplet_semihard_loss,
    weighted_triplet_loss,
)
from multimodal_similarity_tpu.ops.distances import self_distance


# ---------------------------------------------------------------------------
# NumPy oracles (formulas transcribed from the reference docs in SURVEY.md §2.3)
# ---------------------------------------------------------------------------

def _np_triplet(a, p, n, alpha):
    pos = np.sum((a - p) ** 2, axis=1)
    neg = np.sum((a - n) ** 2, axis=1)
    return np.mean(np.maximum(pos - neg + alpha, 0.0))


def _np_hinge(a, p, n, alpha):
    pos = np.sum((a - p) ** 2, axis=1)
    neg = np.sum((a - n) ** 2, axis=1)
    return np.maximum(pos - neg + alpha, 0.0)


def _np_batch_hard(dists, pids, margin, weighted=True):
    n = dists.shape[0]
    same = pids[:, None] == pids[None, :]
    neg_mask = ~same
    pos_mask = same & ~np.eye(n, dtype=bool)

    fp = np.max(dists * pos_mask, axis=1)
    cn = np.array([np.min(dists[i][neg_mask[i]]) for i in range(n)])
    diff = fp - cn
    if margin == "soft":
        diff = np.logaddexp(0.0, diff)
    else:
        diff = np.maximum(diff + margin, 0.0)

    fg = (pids != 0).astype(np.float64)
    if weighted:
        w = np.sum(neg_mask, axis=1).astype(np.float64) * fg
        w = w / w.sum()
    else:
        w = np.full(n, 1.0 / n)
    loss = np.sum(diff * w)
    num_active = np.sum((diff * fg) > 1e-5) / fg.sum()
    return loss, num_active, diff, w, fp, cn


def _np_lifted(dists, pids, margin, weighted=True):
    n = dists.shape[0]
    same = pids[:, None] == pids[None, :]
    neg_mask = ~same
    pos_mask = same & ~np.eye(n, dtype=bool)

    def lse(v):
        m = np.max(v)
        return m + np.log(np.sum(np.exp(v - m)))

    fp = np.array([lse(dists[i] * pos_mask[i]) for i in range(n)])
    cn = np.array([lse((margin - dists[i])[neg_mask[i]]) for i in range(n)])
    diff = np.maximum(fp + cn, 0.0)

    fg = (pids != 0).astype(np.float64)
    if weighted:
        w = np.sum(neg_mask, axis=1).astype(np.float64) * fg
        w = w / w.sum()
    else:
        w = np.full(n, 1.0 / n)
    return np.sum(diff * w), fp, cn


def _np_semihard(labels, emb, margin):
    n = len(labels)
    d = np.sqrt(np.maximum(
        np.sum((emb[:, None, :] - emb[None, :, :]) ** 2, axis=-1), 0.0))
    total, count = 0.0, 0
    for i in range(n):
        for j in range(n):
            if i == j or labels[i] != labels[j]:
                continue
            count += 1
            negs = [d[i, k] for k in range(n) if labels[k] != labels[i]]
            outside = [x for x in negs if x > d[i, j]]
            dn = min(outside) if outside else max(negs)
            total += max(margin + d[i, j] - dn, 0.0)
    return total / max(count, 1e-16)


# ---------------------------------------------------------------------------


def test_triplet_loss(rng):
    a, p, n = (rng.randn(12, 8).astype(np.float32) for _ in range(3))
    got = float(triplet_loss(jnp.array(a), jnp.array(p), jnp.array(n), 0.2))
    np.testing.assert_allclose(got, _np_triplet(a, p, n, 0.2), rtol=1e-5)


def test_triplet_loss_per_triplet_alpha(rng):
    a, p, n = (rng.randn(12, 8).astype(np.float32) for _ in range(3))
    alpha = rng.rand(12).astype(np.float32)
    got = float(triplet_loss(jnp.array(a), jnp.array(p), jnp.array(n),
                             jnp.array(alpha)))
    pos = np.sum((a - p) ** 2, 1)
    neg = np.sum((a - n) ** 2, 1)
    want = np.mean(np.maximum(pos - neg + alpha, 0.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_triplet_loss_masked_equals_subset(rng):
    a, p, n = (rng.randn(10, 4).astype(np.float32) for _ in range(3))
    mask = np.array([1, 1, 1, 1, 0, 0, 0, 0, 0, 0], dtype=np.float32)
    got = float(triplet_loss_masked(jnp.array(a), jnp.array(p), jnp.array(n),
                                    jnp.array(mask), 0.2))
    want = _np_triplet(a[:4], p[:4], n[:4], 0.2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_triplet_loss_masked_empty(rng):
    a, p, n = (rng.randn(4, 4).astype(np.float32) for _ in range(3))
    got = float(triplet_loss_masked(jnp.array(a), jnp.array(p), jnp.array(n),
                                    jnp.zeros(4), 0.2))
    assert got == 0.0


def test_weighted_triplet_loss(rng):
    a, p, n = (rng.randn(9, 6).astype(np.float32) for _ in range(3))
    p1 = rng.rand(9).astype(np.float32)
    p2 = rng.rand(9).astype(np.float32)
    loss, w = weighted_triplet_loss(jnp.array(a), jnp.array(p), jnp.array(n),
                                    jnp.array(p1), jnp.array(p2), 0.2)
    want = np.mean(
        p1 * (1 - p2) * _np_hinge(a, p, n, 0.2)
        + (1 - p1) * p2 * _np_hinge(a, n, p, 0.2)
        + p1 * p2 * 0.5 * (_np_hinge(a, p, a, -0.4) + _np_hinge(a, n, a, -0.4))
        + (1 - p1) * (1 - p2) * 0.5
        * (_np_hinge(a, a, p, 0.4) + _np_hinge(a, a, n, 0.4)))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    assert w.shape == (9, 4)


@pytest.mark.parametrize("margin", ["soft", 0.5])
@pytest.mark.parametrize("weighted", [True, False])
def test_batch_hard(rng, margin, weighted):
    emb = rng.randn(20, 8).astype(np.float32)
    pids = rng.randint(0, 4, size=20).astype(np.float32)
    pids[:3] = 1  # ensure a foreground positive pair exists
    dists = np.asarray(self_distance(jnp.array(emb)))
    loss, num_active, diff, w, fp, cn = batch_hard(
        jnp.array(dists), jnp.array(pids), margin, weighted)
    el, ea, ed, ew, efp, ecn = _np_batch_hard(
        dists.astype(np.float64), pids, margin, weighted)
    np.testing.assert_allclose(float(loss), el, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(diff), ed, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fp), efp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cn), ecn, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(num_active), ea, rtol=1e-4)


@pytest.mark.parametrize("weighted", [True, False])
def test_lifted_loss(rng, weighted):
    emb = rng.randn(16, 8).astype(np.float32)
    pids = rng.randint(0, 4, size=16).astype(np.float32)
    pids[:3] = 2
    dists = np.asarray(self_distance(jnp.array(emb)))
    loss, _, diff, w, fp, cn = lifted_loss(
        jnp.array(dists), jnp.array(pids), 0.5, weighted)
    el, efp, ecn = _np_lifted(dists.astype(np.float64), pids, 0.5, weighted)
    np.testing.assert_allclose(float(loss), el, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(fp), efp, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cn), ecn, rtol=1e-4)


def test_npairs_loss(rng):
    a = rng.randn(10, 6).astype(np.float32)
    p = rng.randn(10, 6).astype(np.float32)
    labels = rng.randint(0, 4, size=10)
    got = float(npairs_loss(jnp.array(labels), jnp.array(a), jnp.array(p)))

    sim = a @ p.T
    eq = (labels[:, None] == labels[None, :]).astype(np.float64)
    tgt = eq / eq.sum(1, keepdims=True)
    logp = sim - np.log(np.sum(np.exp(sim - sim.max(1, keepdims=True)),
                               axis=1, keepdims=True)) - sim.max(1, keepdims=True)
    xent = np.mean(-np.sum(tgt * logp, axis=1))
    reg = 0.25 * 0.002 * (np.mean(np.sum(a ** 2, 1)) + np.mean(np.sum(p ** 2, 1)))
    np.testing.assert_allclose(got, xent + reg, rtol=1e-4)


def test_triplet_semihard(rng):
    emb = rng.randn(14, 5).astype(np.float32)
    labels = rng.randint(0, 4, size=14)
    labels[:3] = 1
    got = float(triplet_semihard_loss(jnp.array(labels), jnp.array(emb),
                                      margin=1.0))
    want = _np_semihard(labels, emb.astype(np.float64), 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_dcca_against_sklearn(rng):
    # mirror of the reference's own validation (preprocess/scripts.py:538-567)
    sklearn = pytest.importorskip("sklearn.cross_decomposition")
    u = rng.random_sample(1800).reshape(600, 3)
    v0 = rng.random_sample(1800).reshape(600, 3)
    v = 0.6 * u + 0.4 * v0  # correlated views

    cca = sklearn.CCA(n_components=3)
    u_c, v_c = cca.fit_transform(u, v)
    want = sum(np.corrcoef(u_c[:, i], v_c[:, i])[0, 1] for i in range(3))

    got = -float(dcca_loss(jnp.array(u, dtype=jnp.float32),
                           jnp.array(v, dtype=jnp.float32), k=3))
    np.testing.assert_allclose(got, want, rtol=2e-2)


def test_dcca_gradient_finite(rng):
    import jax
    u = jnp.array(rng.randn(50, 4), dtype=jnp.float32)
    v = jnp.array(rng.randn(50, 4), dtype=jnp.float32)
    g = jax.grad(lambda a: dcca_loss(a, v))(u)
    assert np.isfinite(np.asarray(g)).all()


def test_classification_loss(rng):
    logits = rng.randn(12, 7).astype(np.float32)
    labels = rng.randint(0, 7, size=12)
    loss, acc = classification_loss(jnp.array(logits), jnp.array(labels))
    m = logits.max(1, keepdims=True)
    logp = logits - m - np.log(np.sum(np.exp(logits - m), 1, keepdims=True))
    want = -np.mean(logp[np.arange(12), labels])
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    want_acc = np.mean(np.argmax(logits, 1) == labels)
    np.testing.assert_allclose(float(acc), want_acc)


def test_normalized_mutual_information_vs_sklearn(rng):
    """The cluster loss's structured margin is real NMI (geometric
    average — sklearn's default in the tf.contrib era that cluster_loss
    py_func'd out to, metric_loss_ops margin_type='nmi')."""
    from sklearn.metrics import normalized_mutual_info_score

    from multimodal_similarity_tpu.ops.losses import (
        normalized_mutual_information)

    n = 40
    for trial in range(5):
        a = rng.randint(0, rng.randint(2, 9), size=n)
        b = rng.randint(0, rng.randint(2, 7), size=n)
        want = normalized_mutual_info_score(a, b,
                                            average_method="geometric")
        got = float(normalized_mutual_information(
            jnp.array(a), jnp.array(b), n))
        np.testing.assert_allclose(got, want, atol=1e-5)
    # special cases: identical single-cluster labelings -> 1.0; one side
    # single-cluster -> 0.0 (both per sklearn)
    ones = jnp.zeros(n, jnp.int32)
    mixed = jnp.array(rng.randint(0, 4, size=n))
    assert float(normalized_mutual_information(ones, ones, n)) == 1.0
    np.testing.assert_allclose(
        float(normalized_mutual_information(ones, mixed, n)), 0.0,
        atol=1e-6)
    # perfect agreement up to relabeling -> 1.0
    perm = jnp.array((np.asarray(mixed) + 7) * 3)
    np.testing.assert_allclose(
        float(normalized_mutual_information(mixed, perm % n, n)), 1.0,
        atol=1e-5)


def test_cluster_loss_properties(rng):
    import jax
    from multimodal_similarity_tpu.ops import cluster_loss
    # perfect clusters: predicted facilities recover classes -> loss ~ 0
    labels = np.repeat(np.arange(4), 5)
    centers = np.eye(4, 6) * 10
    emb = jnp.array((centers[labels] + 0.01 * rng.randn(20, 6))
                    .astype(np.float32))
    tight = float(cluster_loss(jnp.array(labels), emb, 1.0))
    # scrambled embeddings: worse clustering -> larger loss
    emb_bad = jnp.array(rng.randn(20, 6).astype(np.float32))
    loose = float(cluster_loss(jnp.array(labels), emb_bad, 1.0))
    assert tight < 0.2
    assert loose > tight
    # differentiable
    g = jax.grad(lambda e: cluster_loss(jnp.array(labels), e, 1.0))(emb_bad)
    assert np.isfinite(np.asarray(g)).all()
