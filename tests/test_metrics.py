import numpy as np
import pytest

from multimodal_similarity_tpu.eval import (
    average_precision,
    evaluate,
    evaluate_simple,
    precision_at_recall,
    recall_at_K,
    retrieval_metrics_device,
)


def _clustered(rng, n=60, n_classes=5, dim=8):
    labels = rng.randint(0, n_classes, size=n)
    centers = rng.randn(n_classes, dim) * 3
    emb = (centers[labels] + 0.5 * rng.randn(n, dim)).astype(np.float32)
    return emb, labels


def test_average_precision_matches_sklearn(rng):
    sk = pytest.importorskip("sklearn.metrics")
    for _ in range(20):
        y_true = rng.randint(0, 2, size=50)
        if y_true.sum() == 0:
            y_true[0] = 1
        y_score = rng.randn(50)
        np.testing.assert_allclose(
            average_precision(y_true, y_score),
            sk.average_precision_score(y_true, y_score), rtol=1e-10)


def test_average_precision_ties_match_sklearn(rng):
    sk = pytest.importorskip("sklearn.metrics")
    y_true = rng.randint(0, 2, size=40)
    y_true[0] = 1
    y_score = rng.randint(0, 5, size=40).astype(float)  # heavy ties
    np.testing.assert_allclose(
        average_precision(y_true, y_score),
        sk.average_precision_score(y_true, y_score), rtol=1e-10)


def test_average_precision_no_positives():
    assert np.isnan(average_precision(np.zeros(10), np.arange(10.0)))


def test_precision_at_recall_semantics():
    # 4 query-class items; alpha=0.5 -> target 2; sorted list below reaches
    # the 2nd query item at position 3 (0-indexed) -> precision 2/4
    labs = np.array([1, 2, 1, 1, 2, 1])
    prec, d = precision_at_recall(labs, 1, alpha=0.5)
    assert prec == 2 / 3  # break at i=2 (third item): 2 hits of label 1
    # target 0 quirk: breaks at first non-query item
    labs2 = np.array([2, 1, 2])
    prec2, _ = precision_at_recall(labs2, 1, alpha=0.4)  # int(0.4*1)=0
    assert prec2 == 0.0


def test_recall_at_K():
    labs = np.array([2, 3, 1, 1])
    assert recall_at_K(labs, 1, 2) == 0
    assert recall_at_K(labs, 1, 3) == 1


def test_evaluate_simple_perfect_clusters(rng):
    labels = np.repeat(np.arange(1, 4), 10)
    centers = np.eye(3) * 100
    emb = (centers[labels - 1] + 0.01 * rng.randn(30, 3)).astype(np.float32)
    mAP, mPrec, recall = evaluate_simple(emb, labels)
    assert mAP > 0.99
    assert recall == 1.0


def test_evaluate_full_outputs(rng):
    emb, labels = _clustered(rng)
    mAP, mAP_event, mPrec, confusion, count, recall = evaluate(emb, labels)
    assert 0 <= mAP <= 1
    assert set(mAP_event) <= set(np.unique(labels[labels > 0]).tolist())
    assert len(recall) == 6
    # recall@K is monotonically non-decreasing in K
    assert all(recall[i] <= recall[i + 1] + 1e-9 for i in range(5))
    cm = confusion["confusion_matrix"]
    assert cm.shape == (len(np.unique(labels)),) * 2


def test_evaluate_without_background_labels(rng):
    """A test split with no background (label 0) must still produce
    normalized confusion rows and correct per-class query counts — the
    background-row special case only applies when label 0 exists."""
    emb, labels = _clustered(rng)
    keep = labels > 0
    emb, labels = emb[keep], labels[keep]
    mAP, mAP_event, mPrec, confusion, count, recall = evaluate(emb, labels)
    uniq = confusion["labels"]
    assert 0 not in uniq
    cm = confusion["confusion_matrix"]
    for r, l in enumerate(uniq):
        want_count = int((labels == int(l)).sum())
        got_count = int(np.ravel(count[r])[0])
        assert got_count == want_count, (l, got_count, want_count)
        if want_count:
            # soft-assignment rows are per-query distributions -> a
            # normalized row sums to ~1
            np.testing.assert_allclose(cm[r].sum(), 1.0, rtol=1e-4)


def test_device_metrics_match_oracle(rng):
    emb, labels = _clustered(rng, n=50)
    mAP_o, mPrec_o, rec1_o = evaluate_simple(emb, labels)
    mAP_d, mPrec_d, recs = retrieval_metrics_device(emb, labels)
    # same data, tie-free: device metrics must match the oracle closely
    np.testing.assert_allclose(mAP_d, mAP_o, atol=1e-3)
    np.testing.assert_allclose(recs[1], rec1_o, atol=1e-6)
    np.testing.assert_allclose(mPrec_d, mPrec_o, atol=1e-3)


def test_device_metrics_recall_monotone(rng):
    emb, labels = _clustered(rng, n=70)
    _, _, recs = retrieval_metrics_device(emb, labels)
    ks = sorted(recs)
    vals = [recs[k] for k in ks]
    assert all(vals[i] <= vals[i + 1] + 1e-9 for i in range(len(vals) - 1))


def test_evaluate_simple_golden_values():
    """Hand-computed golden case: 2 classes on a line.

    points: labels [1, 1, 2, 2] at x = 0, 1, 3, 10 (1-d embeddings).
    Query 0 (lab 1): dists to [1, 3, 10] -> ranking [1, 3, 10] labels
      [1, 2, 2]; positive first => AP = 1. recall@1 = 1. prec@0.5:
      target = int(0.5 * 1) = 0 -> breaks at first non-query item; first
      item IS the positive -> runs to end, prec = 1/3.
    Query 1 (lab 1): dists [1, 2, 9] -> same structure, AP = 1.
    Query 2 (lab 2): dists to [3, 2, 7] (x=0,1,10) -> nearest is label 1
      at x=1, then label 1 at x=0, then label 2: AP = 1/3, recall@1 = 0.
    Query 3 (lab 2): dists [10, 9, 7] -> nearest label 2 -> AP = 1.
    mAP = (1 + 1 + 1/3 + 1) / 4 = 5/6; recall@1 = 3/4.
    """
    emb = np.array([[0.0], [1.0], [3.0], [10.0]], np.float32)
    labels = np.array([1, 1, 2, 2])
    mAP, mPrec, recall = evaluate_simple(emb, labels)
    np.testing.assert_allclose(mAP, 5 / 6, rtol=1e-9)
    np.testing.assert_allclose(recall, 3 / 4)


def test_device_metrics_nan_when_no_valid_queries():
    """All-background or all-singleton val sets have no valid queries; the
    device metrics must report NaN (matching the NumPy oracle's empty mean),
    not a misleading 0.0."""
    emb = np.random.RandomState(0).randn(6, 8).astype(np.float32)
    labels = np.array([0, 0, 0, 0, 0, 4], np.int32)  # one singleton class
    mAP, mPrec, recalls = retrieval_metrics_device(emb, labels)
    assert np.isnan(mAP) and np.isnan(mPrec)
    assert all(np.isnan(r) for r in recalls.values())
