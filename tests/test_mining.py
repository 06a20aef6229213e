import numpy as np
import jax
import jax.numpy as jnp

from multimodal_similarity_tpu.ops import (
    mine_semihard_triplets, select_triplets_facenet, select_triplets_random)
from multimodal_similarity_tpu.ops.mining import select_batch_balanced
from multimodal_similarity_tpu.ops.distances import self_distance


def _make_batch(rng, n=60, n_classes=5):
    # overlapping clusters: semi-hard negatives only exist when
    # neg_dist - pos_dist < alpha, so classes must not be fully separable
    labels = rng.randint(0, n_classes, size=n)
    centers = rng.randn(n_classes, 8) * 0.5
    emb = centers[labels] + 1.0 * rng.randn(n, 8)
    return emb.astype(np.float32), labels


def test_host_facenet_semihard_property(rng):
    emb, labels = _make_batch(rng)
    dists = np.asarray(self_distance(jnp.array(emb)))
    idx, active = select_triplets_facenet(labels, dists, 30, alpha=0.2)
    assert len(idx) % 3 == 0 and len(idx) > 0
    triplets = np.array(idx).reshape(-1, 3)
    for a, p, n in triplets:
        assert labels[a] == labels[p] and a != p
        assert labels[a] != labels[n]
        assert labels[a] != 0
        # semi-hard constraint (utils.py:479-480)
        assert dists[a, n] - dists[a, p] < 0.2
        assert dists[a, p] < dists[a, n]
    assert active >= 0


def test_host_random_miner(rng):
    emb, labels = _make_batch(rng)
    idx = select_triplets_random(labels, 20)
    triplets = np.array(idx).reshape(-1, 3)
    assert len(triplets) >= 20
    for a, p, n in triplets:
        assert labels[a] == labels[p] and a != p
        assert labels[a] != labels[n]
        assert labels[a] != 0


def test_device_miner_semihard_property(rng):
    emb, labels = _make_batch(rng, n=80)
    dists = self_distance(jnp.array(emb))
    mined = mine_semihard_triplets(dists, jnp.array(labels),
                                   jax.random.PRNGKey(0), 48, alpha=0.2)
    a = np.asarray(mined.anchor)
    p = np.asarray(mined.positive)
    n = np.asarray(mined.negative)
    m = np.asarray(mined.mask)
    d = np.asarray(dists)
    assert a.shape == (48,)
    assert m.sum() > 0
    for i in range(48):
        if m[i] == 0:
            continue
        assert labels[a[i]] == labels[p[i]] and a[i] != p[i]
        assert labels[a[i]] != labels[n[i]]
        assert labels[a[i]] != 0
        assert d[a[i], n[i]] - d[a[i], p[i]] < 0.2
        assert d[a[i], p[i]] < d[a[i], n[i]]


def test_device_miner_all_background(rng):
    emb = rng.randn(16, 4).astype(np.float32)
    labels = np.zeros(16, dtype=np.int32)
    mined = mine_semihard_triplets(self_distance(jnp.array(emb)),
                                   jnp.array(labels),
                                   jax.random.PRNGKey(1), 12)
    assert float(np.asarray(mined.mask).sum()) == 0.0


def test_device_miner_jittable(rng):
    emb, labels = _make_batch(rng, n=64)
    fn = jax.jit(lambda d, l, k: mine_semihard_triplets(d, l, k, 24))
    mined = fn(self_distance(jnp.array(emb)), jnp.array(labels),
               jax.random.PRNGKey(2))
    assert np.asarray(mined.mask).shape == (24,)


def test_select_batch_balanced(rng):
    labels = np.array([0] * 10 + [1] * 3 + [2] * 20 + [3] * 5)
    idx = select_batch_balanced(labels, 30)
    assert len(idx) == 30
    sel = labels[idx]
    assert (sel != 0).all()
    counts = np.bincount(sel, minlength=4)[1:]
    assert counts.max() - counts.min() <= 1


def test_device_hard_structure_mining(rng):
    from multimodal_similarity_tpu.ops.mining import (
        mine_hard_structure_triplets)
    n, n_classes = 60, 5
    labels = rng.randint(0, n_classes, size=n)
    labels[:6] = 1  # guarantee multi-member foreground classes
    labels[6:12] = 2
    sim = rng.rand(n, n).astype(np.float32)
    sim = (sim + sim.T) / 2
    class_margins = jnp.asarray(np.linspace(0.1, 0.5, n_classes + 1)
                                .astype(np.float32))
    mined = mine_hard_structure_triplets(
        jnp.asarray(sim), jnp.asarray(labels), class_margins,
        jax.random.PRNGKey(0), hard_budget=32, struct_budget=16,
        threshold_up=0.8, threshold_down=0.2)
    hard = np.asarray(mined.hard)
    hm = np.asarray(mined.hard_mask)
    assert hm.sum() > 0
    for t in range(32):
        if hm[t] == 0:
            continue
        a, hp, hn = hard[t]
        assert labels[a] > 0
        assert labels[a] == labels[hp] and a != hp
        assert labels[a] != labels[hn]
        # hp is either a confident hard positive or the argmin fallback
        same = (labels == labels[a]) & (np.arange(n) != a)
        if (sim[a][same] < 0.2).any():
            assert sim[a, hp] < 0.2
        else:
            assert sim[a, hp] == sim[a][same].min()
        diff = labels != labels[a]
        if (sim[a][diff] > 0.8).any():
            assert sim[a, hn] > 0.8
        else:
            assert sim[a, hn] == sim[a][diff].max()
    struct = np.asarray(mined.struct)
    sm = np.asarray(mined.struct_mask)
    margins = np.asarray(mined.margins)
    for t in range(16):
        if sm[t] == 0:
            continue
        a, hn, fn = struct[t]
        assert labels[fn] == labels[hn]
        assert sim[a, fn] < 0.2
        np.testing.assert_allclose(margins[t],
                                   np.asarray(class_margins)[labels[fn]])


def test_device_hard_structure_mining_jittable(rng):
    from multimodal_similarity_tpu.ops.mining import (
        mine_hard_structure_triplets)
    labels = rng.randint(0, 4, size=32)
    labels[:4] = 1
    sim = jnp.asarray(rng.rand(32, 32).astype(np.float32))
    cm = jnp.ones(5, jnp.float32) * 0.3
    fn = jax.jit(lambda s, l, k: mine_hard_structure_triplets(
        s, l, cm, k, 16, 8))
    mined = fn(sim, jnp.asarray(labels), jax.random.PRNGKey(1))
    assert np.asarray(mined.hard).shape == (16, 3)
    assert np.asarray(mined.struct).shape == (8, 3)


def test_embedding_miner_matches_dists_miner(rng):
    """Row-wise miner == matrix miner for the same key (same sampling)."""
    from multimodal_similarity_tpu.ops.mining import (
        mine_semihard_triplets_from_embeddings)
    emb, labels = _make_batch(rng, n=60)
    key = jax.random.PRNGKey(5)
    m1 = mine_semihard_triplets(self_distance(jnp.array(emb)),
                                jnp.array(labels), key, 36)
    m2 = mine_semihard_triplets_from_embeddings(
        jnp.array(emb), jnp.array(labels), key, 36)
    np.testing.assert_array_equal(np.asarray(m1.anchor),
                                  np.asarray(m2.anchor))
    np.testing.assert_array_equal(np.asarray(m1.positive),
                                  np.asarray(m2.positive))
    np.testing.assert_array_equal(np.asarray(m1.mask), np.asarray(m2.mask))
    # negatives may differ only at distance ties (none on random data)
    np.testing.assert_array_equal(np.asarray(m1.negative),
                                  np.asarray(m2.negative))


def test_embedding_miner_respects_padding(rng):
    from multimodal_similarity_tpu.ops.mining import (
        mine_semihard_triplets_from_embeddings)
    emb, labels = _make_batch(rng, n=48)
    valid = jnp.array((np.arange(48) < 36).astype(np.float32))
    m = mine_semihard_triplets_from_embeddings(
        jnp.array(emb), jnp.array(labels), jax.random.PRNGKey(0), 24,
        valid=valid)
    a, p, nn, mm = (np.asarray(m.anchor), np.asarray(m.positive),
                    np.asarray(m.negative), np.asarray(m.mask))
    for i in range(24):
        if mm[i]:
            assert a[i] < 36 and p[i] < 36 and nn[i] < 36


def test_rowwise_mul_miner_matches_matrix_miner(rng):
    """mine_hard_structure_triplets_rowwise must reproduce the matrix
    miner's exact triplets given the same key and the same underlying
    similarity function (it consumes identical categorical draws over
    identical logits)."""
    import jax

    from multimodal_similarity_tpu.ops.mining import (
        mine_hard_structure_triplets, mine_hard_structure_triplets_rowwise)

    n = 48
    labels = jnp.asarray(rng.randint(0, 5, size=n).astype(np.int32))
    sim = jnp.asarray(rng.rand(n, n).astype(np.float32))
    sim = 0.5 * (sim + sim.T)
    margins = jnp.asarray(rng.rand(6).astype(np.float32))
    valid = jnp.asarray((rng.rand(n) > 0.1).astype(np.float32))
    key = jax.random.PRNGKey(3)

    a = mine_hard_structure_triplets(sim, labels, margins, key,
                                     hard_budget=16, struct_budget=8,
                                     valid=valid)
    b = mine_hard_structure_triplets_rowwise(
        lambda rows: sim[rows], labels, margins, key,
        hard_budget=16, struct_budget=8, valid=valid)
    np.testing.assert_array_equal(np.asarray(a.hard), np.asarray(b.hard))
    np.testing.assert_array_equal(np.asarray(a.hard_mask),
                                  np.asarray(b.hard_mask))
    np.testing.assert_array_equal(np.asarray(a.struct), np.asarray(b.struct))
    np.testing.assert_array_equal(np.asarray(a.struct_mask),
                                  np.asarray(b.struct_mask))
    np.testing.assert_allclose(np.asarray(a.margins), np.asarray(b.margins))


def test_score_rows_matches_all_pairs_rows(rng):
    """models.score_rows == the corresponding rows of score_all_pairs for
    a real PDDM head (tiled column walk is exact)."""
    import jax

    from multimodal_similarity_tpu.models import (
        PDDM, score_all_pairs, score_rows)

    n, d = 37, 16
    emb = jnp.asarray(rng.randn(n, d).astype(np.float32))
    head = PDDM(n_input=d)
    params = head.init(jax.random.PRNGKey(0), emb[:2], emb[:2],
                       method="score")["params"]
    import functools
    fn = functools.partial(head.apply, {"params": params}, method="score")
    full = np.asarray(score_all_pairs(fn, emb, block=8))
    rows = jnp.asarray([0, 5, 19, 36, 5])
    got = np.asarray(score_rows(fn, emb, rows, block=8))
    np.testing.assert_allclose(got, full[np.asarray(rows)], atol=1e-5)


def test_embedding_miner_float_labels_match_matrix(rng):
    """Distinct float classes (1.2 vs 1.7) must not merge in the rowwise
    miner's class counts — it ranks RAW labels, matching the matrix
    miner's raw-label equality tests."""
    from multimodal_similarity_tpu.ops.mining import (
        mine_semihard_triplets_from_embeddings)
    emb, _ = _make_batch(rng, n=40)
    labels = np.tile([1.2, 1.7, 2.5, 0.0], 10).astype(np.float32)
    key = jax.random.PRNGKey(9)
    m1 = mine_semihard_triplets(self_distance(jnp.array(emb)),
                                jnp.array(labels), key, 24)
    m2 = mine_semihard_triplets_from_embeddings(
        jnp.array(emb), jnp.array(labels), key, 24)
    np.testing.assert_array_equal(np.asarray(m1.anchor),
                                  np.asarray(m2.anchor))
    np.testing.assert_array_equal(np.asarray(m1.positive),
                                  np.asarray(m2.positive))
    np.testing.assert_array_equal(np.asarray(m1.negative),
                                  np.asarray(m2.negative))
    np.testing.assert_array_equal(np.asarray(m1.mask), np.asarray(m2.mask))
