"""Metric-learning losses.

Numerical semantics pinned to the reference implementations in
``/root/reference/src/networks.py:721-914`` (triplet, weighted-triplet,
batch-hard, lifted, DCCA) and the ``tf.contrib`` metric-learning ops the
reference reaches through ``utils.metric_loss`` (utils.py:498-508): n-pairs
and semi-hard triplet.

All functions here are pure, jit-safe, and shape-static: the reference's
ragged boolean_mask / map_fn constructs are replaced by masked reductions
(±inf fills + where), and dynamic "are there any triplets?" staging
(multimodal_model.py:292-297) is expected to be expressed by the caller as a
zero validity mask instead of control flow.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_NEG_INF = -1e30
_POS_INF = 1e30


# ---------------------------------------------------------------------------
# Triplet family
# ---------------------------------------------------------------------------

def triplet_loss(anchor: Array, positive: Array, negative: Array,
                 alpha=0.2) -> Array:
    """max(|a-p|^2 - |a-n|^2 + alpha, 0), mean over the batch.

    ``alpha`` may be a scalar or a per-triplet [N] tensor (the reference feeds
    per-triplet adaptive margins for structure mining,
    multimodal_model.py:282).  Reference: networks.py:721-728.
    """
    pos_dist = jnp.sum(jnp.square(anchor - positive), axis=1)
    neg_dist = jnp.sum(jnp.square(anchor - negative), axis=1)
    basic = pos_dist - neg_dist + alpha
    return jnp.mean(jnp.maximum(basic, 0.0))


def triplet_loss_masked(anchor: Array, positive: Array, negative: Array,
                        mask: Array, alpha=0.2) -> Array:
    """Triplet loss over a fixed-size padded triplet batch.

    ``mask`` is [N] with 1.0 for real triplets, 0.0 for padding.  Equals the
    reference loss evaluated on only the valid triplets; returns 0 when the
    mask is empty (mirrors the reference skipping the step when no triplets
    were mined, base_model.py:278-279).
    """
    pos_dist = jnp.sum(jnp.square(anchor - positive), axis=1)
    neg_dist = jnp.sum(jnp.square(anchor - negative), axis=1)
    basic = jnp.maximum(pos_dist - neg_dist + alpha, 0.0)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(basic * mask) / denom


def weighted_triplet_loss_per_triplet(
        anchor: Array, positive: Array, negative: Array,
        prob_pos: Array, prob_neg: Array,
        alpha: float = 0.2) -> Tuple[Array, Array]:
    """Per-triplet [N] soft 4-way weighted loss (see
    :func:`weighted_triplet_loss`); returns (loss_vec, [N,4] weights)."""

    def _hinge(anc, pos, neg, a):
        pos_dist = jnp.sum(jnp.square(anc - pos), axis=1)
        neg_dist = jnp.sum(jnp.square(anc - neg), axis=1)
        return jnp.maximum(pos_dist - neg_dist + a, 0.0)

    w1 = prob_pos * (1.0 - prob_neg)
    w2 = (1.0 - prob_pos) * prob_neg
    w3 = prob_pos * prob_neg
    w4 = (1.0 - prob_pos) * (1.0 - prob_neg)
    loss = (
        w1 * _hinge(anchor, positive, negative, alpha)
        + w2 * _hinge(anchor, negative, positive, alpha)
        + w3 * 0.5 * (_hinge(anchor, positive, anchor, -alpha * 2)
                      + _hinge(anchor, negative, anchor, -alpha * 2))
        + w4 * 0.5 * (_hinge(anchor, anchor, positive, alpha * 2)
                      + _hinge(anchor, anchor, negative, alpha * 2))
    )
    return loss, jnp.stack([w1, w2, w3, w4], axis=1)


def weighted_triplet_loss(anchor: Array, positive: Array, negative: Array,
                          prob_pos: Array, prob_neg: Array,
                          alpha: float = 0.2) -> Tuple[Array, Array]:
    """Soft 4-way triplet loss weighted by pair-similarity confidences.

    With p1 = P(anchor~positive), p2 = P(anchor~negative):
      w1 = p1(1-p2) * L(A,B,C),  w2 = (1-p1)p2 * L(A,C,B),
      w3 = p1 p2    * [L(A,B,A; -2a) + L(A,C,A; -2a)]/2,
      w4 = (1-p1)(1-p2) * [L(A,A,B; 2a) + L(A,A,C; 2a)]/2.
    Returns (mean loss, [N,4] stacked weights).
    Reference: networks.py:732-761 (duplicated verbatim at :763-792; single
    copy here).
    """
    loss, weights = weighted_triplet_loss_per_triplet(
        anchor, positive, negative, prob_pos, prob_neg, alpha)
    return jnp.mean(loss), weights


# ---------------------------------------------------------------------------
# Batch-structured losses over a full distance matrix
# ---------------------------------------------------------------------------

def _pair_masks(pids: Array):
    """(positive_mask, negative_mask) from a label vector.

    positive excludes the diagonal; negative is label-inequality.
    Reference: networks.py:802-806.
    """
    pids = pids.reshape(-1)
    same = pids[:, None] == pids[None, :]
    eye = jnp.eye(pids.shape[0], dtype=bool)
    positive_mask = same & ~eye
    negative_mask = ~same
    return positive_mask, negative_mask


def batch_hard(dists: Array, pids: Array, margin="soft",
               weighted: bool = True):
    """Batch-hard triplet loss ("In Defense of the Triplet Loss").

    For each anchor: furthest positive minus closest negative; softplus for
    margin == "soft", else hinge at ``margin``.  ``weighted`` reweights
    anchors by their negative count (inverse class frequency) and masks out
    background (pid == 0) anchors.  Returns
    (loss, num_active, diff, weights, furthest_positive, closest_negative),
    matching the reference tuple at networks.py:797-833.

    The reference's ragged ``map_fn(boolean_mask)`` min is replaced by a
    masked min (+inf fill) — identical values, one fused reduction on TPU.
    """
    pids = pids.reshape(-1).astype(dists.dtype)
    batch_size = dists.shape[0]
    positive_mask, negative_mask = _pair_masks(pids)

    # reference multiplies by the mask (not a masked max): anchors with no
    # positive contribute 0, since dists >= 0  (networks.py:808)
    furthest_positive = jnp.max(dists * positive_mask.astype(dists.dtype), axis=1)
    closest_negative = jnp.min(
        jnp.where(negative_mask, dists, _POS_INF), axis=1)

    diff = furthest_positive - closest_negative
    if margin == "soft":
        diff = jax.nn.softplus(diff)
    else:
        diff = jnp.maximum(diff + margin, 0.0)

    foreground_mask = (pids != 0.0).astype(dists.dtype)
    foreground_num = jnp.sum(foreground_mask)
    if weighted:
        weights = jnp.sum(negative_mask.astype(dists.dtype), axis=1)
        weights = weights * foreground_mask
        weights = weights / jnp.sum(weights)
    else:
        weights = jnp.full((batch_size,), 1.0 / batch_size, dtype=dists.dtype)

    loss = jnp.sum(diff * weights)
    num_active = jnp.sum((diff * foreground_mask > 1e-5).astype(dists.dtype))
    num_active = num_active / foreground_num
    return loss, num_active, diff, weights, furthest_positive, closest_negative


def lifted_loss(dists: Array, pids: Array, margin: float,
                weighted: bool = True):
    """Lifted-structured loss, reference semantics (networks.py:835-870).

    Note: the reference takes logsumexp over ``dists * positive_mask`` along
    the full row — masked-out entries contribute exp(0) = 1 terms.  That is
    the trained objective, so it is reproduced exactly here; the negative
    side is a properly masked logsumexp of (margin - dists).
    """
    pids = pids.reshape(-1).astype(dists.dtype)
    batch_size = dists.shape[0]
    positive_mask, negative_mask = _pair_masks(pids)

    furthest_positive = jax.nn.logsumexp(
        dists * positive_mask.astype(dists.dtype), axis=1)
    closest_negative = jax.nn.logsumexp(
        jnp.where(negative_mask, margin - dists, _NEG_INF), axis=1)

    diff = jnp.maximum(furthest_positive + closest_negative, 0.0)

    foreground_mask = (pids != 0.0).astype(dists.dtype)
    if weighted:
        weights = jnp.sum(negative_mask.astype(dists.dtype), axis=1)
        weights = weights * foreground_mask
        weights = weights / jnp.sum(weights)
    else:
        weights = jnp.full((batch_size,), 1.0 / batch_size, dtype=dists.dtype)

    loss = jnp.sum(diff * weights)
    num_active = jnp.asarray(1.0, dtype=dists.dtype)
    return loss, num_active, diff, weights, furthest_positive, closest_negative


def npairs_loss(labels: Array, embeddings_anchor: Array,
                embeddings_positive: Array,
                reg_lambda: float = 0.002) -> Array:
    """N-pairs loss (tf.contrib.losses.metric_learning.npairs_loss).

    Cross entropy between the anchor-positive similarity logits and the
    row-normalized label-equality matrix, plus 0.25*reg_lambda*(mean |a|^2 +
    mean |p|^2).  Reference passthrough: utils.py:503-504.
    """
    labels = labels.reshape(-1)
    reg_anchor = jnp.mean(jnp.sum(jnp.square(embeddings_anchor), axis=1))
    reg_positive = jnp.mean(jnp.sum(jnp.square(embeddings_positive), axis=1))
    l2loss = 0.25 * reg_lambda * (reg_anchor + reg_positive)

    similarity = jnp.dot(embeddings_anchor, embeddings_positive.T,
                         preferred_element_type=jnp.float32)
    labels_equal = (labels[:, None] == labels[None, :]).astype(similarity.dtype)
    targets = labels_equal / jnp.sum(labels_equal, axis=1, keepdims=True)

    log_probs = jax.nn.log_softmax(similarity, axis=1)
    xent = -jnp.sum(targets * log_probs, axis=1)
    return jnp.mean(xent) + l2loss


def triplet_semihard_loss(labels: Array, embeddings: Array,
                          margin: float = 1.0) -> Array:
    """Semi-hard triplet loss (tf.contrib.losses.metric_learning).

    For every anchor-positive pair (i, j): pick the negative n minimizing
    D(i, n) among negatives with D(i, n) > D(i, j) ("outside"); if none
    exists, the furthest negative ("inside").  Hinge at ``margin``, averaged
    over the number of positive pairs.  Distances are (non-squared) euclidean
    of the Gram expansion, matching metric_loss_ops.pairwise_distance with
    squared=False.  Reference passthrough: utils.py:499-500.
    """
    labels = labels.reshape(-1)
    x = embeddings.astype(jnp.float32)
    sq = jnp.sum(jnp.square(x), axis=1)
    pdist_sq = jnp.maximum(
        sq[:, None] + sq[None, :]
        - 2.0 * jnp.dot(x, x.T, preferred_element_type=jnp.float32), 0.0)
    error_mask = pdist_sq > 0.0
    pdist = jnp.sqrt(pdist_sq + jnp.where(error_mask, 0.0, 1e-16))
    pdist = pdist * error_mask.astype(pdist.dtype)

    adjacency = labels[:, None] == labels[None, :]
    adjacency_not = ~adjacency
    n = labels.shape[0]

    # For pair (i, j): among negatives k of anchor i, the smallest
    # pdist[i, k] subject to pdist[i, k] > pdist[i, j].
    # mask[i, j, k] = adjacency_not[i, k] & (pdist[i, k] > pdist[i, j])
    greater = pdist[:, None, :] > pdist[:, :, None]          # [i, j, k]
    mask_outside = adjacency_not[:, None, :] & greater        # [i, j, k]
    neg_outside = jnp.min(
        jnp.where(mask_outside, pdist[:, None, :], _POS_INF), axis=2)
    has_outside = jnp.any(mask_outside, axis=2)

    neg_inside = jnp.max(
        jnp.where(adjacency_not, pdist, _NEG_INF), axis=1)    # [i]
    neg_inside = jnp.broadcast_to(neg_inside[:, None], (n, n))

    semi_hard_negatives = jnp.where(has_outside, neg_outside, neg_inside)
    loss_mat = margin + pdist - semi_hard_negatives

    mask_positives = adjacency & ~jnp.eye(n, dtype=bool)
    num_positives = jnp.maximum(jnp.sum(mask_positives), 1e-16)
    loss = jnp.sum(
        jnp.maximum(loss_mat * mask_positives.astype(loss_mat.dtype), 0.0))
    return loss / num_positives


def normalized_mutual_information(assign_a: Array, assign_b: Array,
                                  n: int) -> Array:
    """NMI between two integer labelings with values in ``[0, n)``.

    Matches sklearn's ``normalized_mutual_info_score`` with the GEOMETRIC
    average (``MI / sqrt(H(a) * H(b))``) — the sklearn default of the
    tf.contrib era, which contrib's ``cluster_loss`` invoked through a
    ``py_func``; pinned against sklearn in tests/test_losses.py.  When both
    labelings are a single cluster the score is 1.0 (sklearn's special
    case); when exactly one is, MI is 0 and the score is 0.
    """
    eye = jnp.arange(n)
    a_oh = (assign_a.reshape(-1)[:, None] == eye[None, :]).astype(jnp.float32)
    b_oh = (assign_b.reshape(-1)[:, None] == eye[None, :]).astype(jnp.float32)
    npts = a_oh.shape[0]
    joint = jnp.dot(a_oh.T, b_oh,
                    preferred_element_type=jnp.float32) / npts      # [n, n]
    pa = jnp.sum(joint, axis=1)
    pb = jnp.sum(joint, axis=0)

    def _xlogx(p):
        return p * jnp.log(jnp.where(p > 0, p, 1.0))

    mi = jnp.sum(jnp.where(
        joint > 0,
        joint * (jnp.log(jnp.where(joint > 0, joint, 1.0))
                 - jnp.log(jnp.where(pa > 0, pa, 1.0))[:, None]
                 - jnp.log(jnp.where(pb > 0, pb, 1.0))[None, :]), 0.0))
    ha = -jnp.sum(_xlogx(pa))
    hb = -jnp.sum(_xlogx(pb))
    both_single = (ha < 1e-12) & (hb < 1e-12)
    return jnp.where(both_single, 1.0,
                     mi / jnp.maximum(jnp.sqrt(ha * hb), 1e-10))


def _batched_candidate_nmi(d: Array, min_d: Array, nearest: Array,
                           class_id: Array, chunk: int = 16) -> Array:
    """For every candidate facility j, the NMI between the true classes and
    the cluster assignment obtained by adding j to the current facility set
    (a point moves to j iff strictly closer than its current facility —
    contrib's argmin over [chosen..., candidate] keeps ties with chosen).
    Returns [n] NMI scores.

    The candidate axis is walked in ``chunk``-wide strips under
    ``lax.map`` so peak memory is O(chunk * n^2), not the O(n^3) a one-shot
    per-candidate one-hot would need (4 GB at n=1024).  Compute stays
    O(n^3) per strip (one [n*chunk, n] x [n, n] contraction); the loss is a
    latent reference path (utils.metric_loss 'cluster' has no Honda
    caller, only the CUB scripts at batch <= a few hundred), so that bound
    is comfortable at every real operating point.
    """
    n = d.shape[0]
    chunk = min(chunk, n)
    eye = jnp.arange(n)
    b_oh = (class_id[:, None] == eye[None, :]).astype(jnp.float32)  # [i, b]
    pad = (-n) % chunk
    cand = jnp.concatenate([eye, jnp.zeros((pad,), eye.dtype)]) if pad else eye

    def one_strip(js):                                          # [c]
        moved = d[:, js] < min_d[:, None]                       # [i, c]
        assign = jnp.where(moved, js[None, :], nearest[:, None])
        a_oh = (assign[:, :, None]
                == eye[None, None, :]).astype(jnp.float32)      # [i, c, a]
        joint = jnp.einsum("ija,ib->jab", a_oh, b_oh,
                           preferred_element_type=jnp.float32) / n
        pa = jnp.sum(joint, axis=2)                             # [c, a]
        pb = jnp.sum(joint, axis=1)                             # [c, b]
        log_pa = jnp.log(jnp.where(pa > 0, pa, 1.0))
        log_pb = jnp.log(jnp.where(pb > 0, pb, 1.0))
        mi = jnp.sum(jnp.where(
            joint > 0,
            joint * (jnp.log(jnp.where(joint > 0, joint, 1.0))
                     - log_pa[:, :, None] - log_pb[:, None, :]), 0.0),
            axis=(1, 2))                                        # [c]
        ha = -jnp.sum(pa * log_pa, axis=1)
        hb = -jnp.sum(pb * log_pb, axis=1)
        both_single = (ha < 1e-12) & (hb < 1e-12)
        return jnp.where(both_single, 1.0,
                         mi / jnp.maximum(jnp.sqrt(ha * hb), 1e-10))

    out = jax.lax.map(one_strip, cand.reshape(-1, chunk))
    return out.reshape(-1)[:n]


def cluster_loss(labels: Array, embeddings: Array,
                 margin_multiplier: float = 1.0,
                 enable_pam_finetuning: bool = True) -> Array:
    """Facility-location clustering loss (tf.contrib metric_learning
    cluster_loss with margin_type='nmi', reachable through the reference's
    utils.metric_loss 'cluster' branch, utils.py:505-506 — a latent
    utility: no reference entrypoint calls it).

    Structured-prediction form, matching contrib's construction step by
    step: (1) LOSS-AUGMENTED facility selection — greedily add the
    candidate maximizing ``facility_energy + margin_multiplier * (1 -
    NMI(labels, assignment))``, K = #distinct labels facilities
    (contrib's compute_augmented_facility_locations); (2) one PAM
    refinement sweep — each cluster's medoid is re-chosen among its
    members by the same augmented score (contrib's update_all_medoids);
    (3) hinge the augmented predicted score against the oracle
    per-class-best-medoid score.  The NMI is the real normalized mutual
    information (geometric average, sklearn-pinned) computed on device —
    contrib shipped it out to sklearn via py_func.  Selection/refinement
    are stop-gradient index decisions inside lax.while_loops; gradients
    flow through the pairwise distances for the fixed selections, the same
    subgradient contrib propagates.  Known divergence: distance ties
    between facilities resolve by lowest index rather than contrib's
    chosen-order argmin (measure-zero for real embeddings).
    """
    labels = labels.reshape(-1)
    n = labels.shape[0]
    x = embeddings.astype(jnp.float32)
    sq = jnp.sum(jnp.square(x), axis=1)
    d = jnp.maximum(sq[:, None] + sq[None, :]
                    - 2.0 * jnp.dot(x, x.T,
                                    preferred_element_type=jnp.float32), 0.0)

    # number of clusters = number of distinct labels (static bound: n);
    # class_first is a dense [0, n) class id for the NMI contingency
    one_hot_classes = labels[:, None] == labels[None, :]
    class_first = jnp.min(
        jnp.where(one_hot_classes,
                  jnp.arange(n)[None, :], n), axis=1)
    is_first = class_first == jnp.arange(n)
    num_classes = jnp.sum(is_first.astype(jnp.int32))

    d_sg = jax.lax.stop_gradient(d)
    mm = jnp.float32(margin_multiplier)

    def augmented_score(min_d, nearest):
        """Per-candidate loss-augmented score [n]: energy + mm*(1-NMI)."""
        energy = -jnp.sum(jnp.minimum(min_d[:, None], d_sg), axis=0)
        nmi = _batched_candidate_nmi(d_sg, min_d, nearest, class_first)
        return energy + mm * (1.0 - nmi)

    # (1) loss-augmented greedy facility selection
    def sel_cond(carry):
        return carry[0] < num_classes

    def sel_body(carry):
        k, min_d, nearest, chosen = carry
        score = jnp.where(jnp.isin(jnp.arange(n), chosen), -_POS_INF,
                          augmented_score(min_d, nearest))
        j = jnp.argmax(score)
        nearest = jnp.where(d_sg[:, j] < min_d, j, nearest)
        min_d = jnp.minimum(min_d, d_sg[:, j])
        return k + 1, min_d, nearest, chosen.at[k].set(j)

    init = (jnp.int32(0), jnp.full((n,), _POS_INF, jnp.float32),
            jnp.zeros((n,), jnp.int32), jnp.full((n,), -1, jnp.int32))
    _, min_d_pred, nearest, chosen = jax.lax.while_loop(
        sel_cond, sel_body, init)

    # (2) one PAM sweep: re-pick each slot's medoid among its cluster
    # members (incl. itself) by the same augmented score
    if enable_pam_finetuning:
        def pam_body(carry):
            m, _, _, chosen = carry
            slot_valid = (jnp.arange(n) < num_classes) & (jnp.arange(n) != m)
            d_ch = jnp.where(slot_valid[None, :],
                             d_sg[:, jnp.maximum(chosen, 0)], _POS_INF)
            other_min = jnp.min(d_ch, axis=1)                     # [i]
            other_near = jnp.take(jnp.maximum(chosen, 0),
                                  jnp.argmin(d_ch, axis=1))       # [i]
            score = augmented_score(other_min, other_near)
            # candidates: current members of slot m's cluster (closer to
            # its medoid than to every other facility)
            member = jnp.take(d_sg, chosen[m], axis=1) <= other_min
            score = jnp.where(member, score, -_POS_INF)
            j = jnp.argmax(score)
            new_min = jnp.minimum(other_min, d_sg[:, j])
            new_near = jnp.where(d_sg[:, j] < other_min, j, other_near)
            return m + 1, new_min, new_near, chosen.at[m].set(j)

        _, min_d_pred, nearest, chosen = jax.lax.while_loop(
            sel_cond, pam_body,
            (jnp.int32(0), min_d_pred, nearest, chosen))

    nearest = jax.lax.stop_gradient(nearest)

    # (3) differentiable predicted score for the fixed facility set
    score_pred = -jnp.sum(d[jnp.arange(n), nearest])

    # structured margin: 1 - NMI(true classes, predicted clustering)
    nmi_pred = normalized_mutual_information(nearest, class_first, n)
    margin = mm * (1.0 - nmi_pred)

    # oracle score: per-class optimal medoid.  medoid_cost[j] = total
    # distance from j's class members to j; per class take the best medoid
    true_same = one_hot_classes
    medoid_cost = jnp.sum(jnp.where(true_same, d, 0.0), axis=0)       # [n]
    best_per_class = jnp.min(
        jnp.where(true_same, medoid_cost[None, :], _POS_INF), axis=1)  # [n]
    score_gt = -jnp.sum(jnp.where(is_first, best_per_class, 0.0))

    return jnp.maximum(score_pred + margin - score_gt, 0.0)


# ---------------------------------------------------------------------------
# DCCA
# ---------------------------------------------------------------------------

def dcca_loss(x1: Array, x2: Array, k: int = 0,
              rcov1: float = 1e-4, rcov2: float = 1e-4) -> Array:
    """Deep CCA correlation loss: minus the sum of the top-K canonical
    correlations of the two views.

    Mean-center, regularized covariances, eigh-based inverse-sqrt whitening
    with the reference's 1e-12 eigenvalue floor (directions below the floor
    are dropped — expressed here as zero inverse-sqrt weights, which is
    algebraically identical to the reference's gather at networks.py:900-905),
    then SVD of the whitened cross-covariance.  Reference: networks.py:874-914
    (validated there against sklearn CCA, preprocess/scripts.py:538-567).
    """
    n = x1.shape[0]
    d1, d2 = x1.shape[1], x2.shape[1]
    if k == 0:
        k = min(d1, d2)

    x1 = x1 - jnp.mean(x1, axis=0, keepdims=True)
    x2 = x2 - jnp.mean(x2, axis=0, keepdims=True)

    denom = jnp.asarray(n - 1, dtype=x1.dtype)
    s11 = x1.T @ x1 / denom + rcov1 * jnp.eye(d1, dtype=x1.dtype)
    s22 = x2.T @ x2 / denom + rcov2 * jnp.eye(d2, dtype=x2.dtype)
    s12 = x1.T @ x2 / denom

    def _inv_sqrt(s):
        d, v = jnp.linalg.eigh(s)
        valid = d > 1e-12
        d_isqrt = jnp.where(valid, 1.0 / jnp.sqrt(jnp.where(valid, d, 1.0)), 0.0)
        return (v * d_isqrt[None, :]) @ v.T

    t = _inv_sqrt(s11) @ s12 @ _inv_sqrt(s22)
    sv = jnp.linalg.svd(t, compute_uv=False)
    return -jnp.sum(sv[:k])


# ---------------------------------------------------------------------------
# Classification
# ---------------------------------------------------------------------------

def classification_loss(logits: Array, labels: Array) -> Tuple[Array, Array]:
    """Mean softmax cross entropy + accuracy (base_model_classifier.py:91-97)."""
    labels = labels.reshape(-1)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
    return jnp.mean(nll), acc
