"""Triplet mining.

Two tiers:

1. **Host-side reference miners** (`select_triplets_facenet`,
   `select_triplets_random`) — NumPy reimplementations of the reference's
   stateful, ragged algorithms (utils.py:430-496, base_model.py:26-78), kept
   for semantics parity tests and for exact A/B comparison.

2. **On-device miner** (`mine_semihard_triplets`) — the TPU-native
   replacement for the reference's embed-all -> copy-to-host -> NumPy-mine ->
   copy-back round trip (base_model.py:258-287).  Shape-static: a fixed
   triplet budget with a validity mask, sampling driven by a PRNG key.  The
   semi-hard constraint is identical to the reference
   (neg - pos < alpha AND pos < neg, utils.py:479-480); class balancing is
   expressed as inverse-frequency anchor sampling instead of per-class
   iterator round-robin.  Acceptance criterion is retrieval-metric parity,
   not index-trace parity (the reference miner is itself randomized).
"""

from __future__ import annotations

import itertools
import random
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

_NEG_INF = -1e30


class MinedTriplets(NamedTuple):
    """Fixed-size mined triplet batch (padded, with validity mask)."""

    anchor: Array     # [T] int32 indices into the event batch
    positive: Array   # [T]
    negative: Array   # [T]
    mask: Array       # [T] float32, 1.0 = real triplet
    active_count: Array  # scalar: mean number of admissible negatives per pair


def mine_semihard_triplets(
    dists: Array,
    labels: Array,
    key: jax.Array,
    triplet_per_batch: int,
    alpha: float = 0.2,
    num_negative: int = 3,
    valid: Optional[Array] = None,
) -> MinedTriplets:
    """Sample semi-hard triplets entirely on device.

    dists  -- [N, N] pairwise distance matrix (any metric)
    labels -- [N] int labels; 0 is background and never anchors/positives
    valid  -- optional [N] bool/float mask; padding rows (valid == 0) are
              excluded from anchors, positives, AND negatives

    Strategy: draw ceil(T / num_negative) anchor-positive pairs with
    class-balanced anchors (weight 1/class-count, foreground classes with
    >= 2 members only), a uniform same-class positive per anchor, then
    ``num_negative`` independent uniform draws from each pair's admissible
    semi-hard negative set.  Pairs with an empty negative set are masked out
    (the reference simply skips them, utils.py:483-484).
    """
    labels = labels.reshape(-1)
    n = labels.shape[0]
    num_pairs = -(-triplet_per_batch // num_negative)
    if valid is None:
        valid_b = jnp.ones((n,), dtype=bool)
    else:
        valid_b = valid.reshape(-1).astype(bool)

    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(n, dtype=bool)
    pos_mask = same & ~eye & valid_b[None, :]    # admissible positives per row
    foreground = (labels > 0) & valid_b

    class_count = jnp.sum(same & valid_b[None, :], axis=1)  # incl. self
    can_anchor = foreground & (class_count >= 2)
    anchor_logw = jnp.where(can_anchor, -jnp.log(class_count.astype(jnp.float32)),
                            _NEG_INF)

    k_a, k_p, k_n = jax.random.split(key, 3)
    anchors = jax.random.categorical(
        k_a, jnp.broadcast_to(anchor_logw, (num_pairs, n)), axis=1)  # [P]

    pos_logw = jnp.where(pos_mask[anchors], 0.0, _NEG_INF)           # [P, N]
    positives = jax.random.categorical(k_p, pos_logw, axis=1)        # [P]

    pos_dist = dists[anchors, positives]                             # [P]
    neg_rows = dists[anchors]                                        # [P, N]
    diff_class = ~same[anchors]                                      # [P, N]
    semihard = (diff_class
                & valid_b[None, :]
                & (neg_rows - pos_dist[:, None] < alpha)
                & (pos_dist[:, None] < neg_rows))                    # [P, N]
    has_neg = jnp.any(semihard, axis=1)                              # [P]
    active = jnp.sum(semihard, axis=1).astype(jnp.float32)

    neg_logw = jnp.where(semihard, 0.0, _NEG_INF)                    # [P, N]
    neg_keys = jax.random.split(k_n, num_negative)
    negatives = jnp.stack(
        [jax.random.categorical(k, neg_logw, axis=1) for k in neg_keys],
        axis=1)                                                      # [P, R]

    t = num_pairs * num_negative
    anchor_idx = jnp.repeat(anchors, num_negative)[:t]
    positive_idx = jnp.repeat(positives, num_negative)[:t]
    negative_idx = negatives.reshape(-1)[:t]
    mask = jnp.repeat(has_neg, num_negative)[:t].astype(jnp.float32)

    # drop everything if no class can anchor (all-background batch)
    any_anchor = jnp.any(can_anchor)
    mask = mask * any_anchor.astype(jnp.float32)

    return MinedTriplets(
        anchor=anchor_idx.astype(jnp.int32),
        positive=positive_idx.astype(jnp.int32),
        negative=negative_idx.astype(jnp.int32),
        mask=mask,
        active_count=jnp.mean(active),
    )


# ---------------------------------------------------------------------------
# Host-side reference miners (NumPy, semantics-exact)
# ---------------------------------------------------------------------------

def select_triplets_facenet(
    lab,
    all_dist: np.ndarray,
    triplet_per_batch: int,
    alpha: float = 0.2,
    num_negative: int = 3,
    rng: random.Random | None = None,
) -> Tuple[List[int], float]:
    """Reference facenet semi-hard miner (utils.py:430-496), NumPy-exact.

    Returns a flat [a, p, n, a, p, n, ...] index list plus the mean count of
    admissible negatives (active_count monitoring signal).
    """
    rng = rng or random
    np_lab = np.asarray(lab).reshape(-1)

    idx_dict: dict[int, list[int]] = {}
    for i, l in enumerate(np_lab):
        idx_dict.setdefault(int(l), []).append(i)
    for key in idx_dict:
        rng.shuffle(idx_dict[key])

    foreground = {k: itertools.permutations(v, 2)
                  for k, v in idx_dict.items() if k != 0}

    triplet_idx: List[int] = []
    neg_counts: List[int] = []
    while len(triplet_idx) < triplet_per_batch * 3:
        keys = list(foreground.keys())
        if not keys:
            break
        for key in keys:
            try:
                an_idx, pos_idx = next(foreground[key])
            except StopIteration:
                del foreground[key]
                continue

            pos_dist = all_dist[an_idx, pos_idx]
            neg_dist = np.array(all_dist[an_idx], dtype="float64")
            neg_dist[idx_dict[key]] = np.nan

            with np.errstate(invalid="ignore"):
                all_neg = np.where((neg_dist - pos_dist < alpha)
                                   & (pos_dist < neg_dist))[0]
            neg_counts.append(len(all_neg))

            if len(all_neg) > 0:
                for _ in range(min(len(all_neg), num_negative)):
                    neg_idx = int(all_neg[np.random.randint(len(all_neg))])
                    triplet_idx.extend([an_idx, pos_idx, neg_idx])
                    if len(triplet_idx) >= triplet_per_batch * 3:
                        return triplet_idx, float(np.mean(neg_counts))

    if triplet_idx:
        return triplet_idx, float(np.mean(neg_counts))
    return [], 0.0


def select_triplets_random(
    lab,
    triplet_per_batch: int,
    num_negative: int = 3,
    rng: random.Random | None = None,
) -> List[int]:
    """Reference random-negative miner (base_model.py:26-78), returning
    indices instead of gathered features (the gather happens on device)."""
    rng = rng or random
    np_lab = np.asarray(lab).reshape(-1)

    idx_dict: dict[int, list[int]] = {}
    for i, l in enumerate(np_lab):
        idx_dict.setdefault(int(l), []).append(i)
    for key in idx_dict:
        rng.shuffle(idx_dict[key])

    foreground = {k: itertools.permutations(v, 2)
                  for k, v in idx_dict.items() if k != 0}

    triplet_idx: List[int] = []
    while len(triplet_idx) < triplet_per_batch * 3:
        keys = list(foreground.keys())
        if not keys:
            break
        for key in keys:
            all_neg = np.where(np_lab != key)[0]
            try:
                an_idx, pos_idx = next(foreground[key])
            except StopIteration:
                del foreground[key]
                continue
            for _ in range(num_negative):
                neg_idx = int(all_neg[np.random.randint(len(all_neg))])
                triplet_idx.extend([an_idx, pos_idx, neg_idx])
    return triplet_idx


def select_batch_balanced(
    labels,
    batch_size: int,
    rng: random.Random | None = None,
) -> np.ndarray:
    """Class-balanced round-robin batch builder for batch-hard / lifted
    training (base_model_batchhard.py:24-60): cycle foreground classes,
    taking one shuffled index from each until ``batch_size`` is reached;
    classes are recycled if exhausted."""
    rng = rng or random
    np_lab = np.asarray(labels).reshape(-1)
    idx_dict: dict[int, list[int]] = {}
    for i, l in enumerate(np_lab):
        if int(l) != 0:
            idx_dict.setdefault(int(l), []).append(i)
    if not idx_dict:
        return np.zeros((0,), dtype=np.int64)
    pools = {k: list(v) for k, v in idx_dict.items()}
    for key in pools:
        rng.shuffle(pools[key])
    out: List[int] = []
    keys = list(pools.keys())
    cursor = {k: 0 for k in keys}
    while len(out) < batch_size:
        for key in keys:
            if cursor[key] >= len(pools[key]):
                rng.shuffle(pools[key])
                cursor[key] = 0
            out.append(pools[key][cursor[key]])
            cursor[key] += 1
            if len(out) >= batch_size:
                break
    return np.asarray(out, dtype=np.int64)
