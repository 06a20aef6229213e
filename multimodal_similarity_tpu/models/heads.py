"""Pairwise similarity heads: PairSim, PairSim2, PDDM.

Reference: networks.py:166-319.  Each head maps a pair of embeddings to a
2-way similar/dissimilar distribution.  In addition to the reference's
[B, 2, d] pair interface, each head exposes ``score`` on pre-split
(x_i, x_j) tensors so the all-pairs pseudo-labeling pass
(multimodal_model.py:459-480) can run blockwise on device via vmap/broadcast
instead of an O(N^2) host loop of session.run calls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jnp.ndarray

Dense = functools.partial(
    nn.Dense,
    kernel_init=nn.initializers.xavier_uniform(),
    bias_init=nn.initializers.zeros_init(),
)


def _l2_normalize(x: Array, eps: float = 1e-10) -> Array:
    # tf.nn.l2_normalize semantics: x * rsqrt(max(sum(x^2), eps)) — the
    # floor applies to the squared SUM, so near-zero vectors (like the
    # u-branch for a self-pair) stay near zero instead of blowing up to
    # unit norm
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))


class PairSim(nn.Module):
    """Concat-pair MLP -> 2-way softmax (networks.py:213-258).

    Returns (logits, prob)."""

    n_input: int = 128
    keep_prob: float = 1.0

    def __call__(self, x: Array, train: bool = False):
        """x -- [B, 2, n_input] feature pairs."""
        return self.score(x[:, 0], x[:, 1], train)

    @nn.compact_name_scope
    def score(self, x_a: Array, x_b: Array, train: bool = False):
        h = jnp.concatenate([x_a, x_b], axis=-1)
        h = nn.Dropout(1.0 - self.keep_prob, deterministic=not train)(h)
        h = nn.relu(Dense(self.n_input, name="pairwise")(h))
        h = nn.Dropout(1.0 - self.keep_prob, deterministic=not train)(h)
        logits = Dense(2, name="out")(h)
        return logits, jax.nn.softmax(logits)


class PairSim2(nn.Module):
    """Squared-difference MLP -> 2-way softmax (networks.py:166-211)."""

    n_input: int = 128
    keep_prob: float = 1.0

    def __call__(self, x: Array, train: bool = False):
        return self.score(x[:, 0], x[:, 1], train)

    @nn.compact_name_scope
    def score(self, x_a: Array, x_b: Array, train: bool = False):
        h = jnp.square(x_a - x_b)
        h = nn.relu(Dense(self.n_input, name="pairwise")(h))
        h = nn.Dropout(1.0 - self.keep_prob, deterministic=not train)(h)
        logits = Dense(2, name="out")(h)
        return logits, jax.nn.softmax(logits)


class PDDM(nn.Module):
    """Position-Dependent Deep Metric unit (networks.py:260-319; "Local
    Similarity-Aware Deep Feature Embedding").

    u = |x_i - x_j|, v = (x_i + x_j)/2; each branch FC + relu + l2-norm; the
    concat passes one more FC into a 2-way score.  Returns (logits, prob);
    prob[:, 1] is the similarity confidence used for pseudo-labels."""

    n_input: int = 128

    def __call__(self, x: Array, train: bool = False):
        return self.score(x[:, 0], x[:, 1])

    @nn.compact_name_scope
    def score(self, x_i: Array, x_j: Array, train: bool = False):
        u = jnp.abs(x_i - x_j)
        v = 0.5 * (x_i + x_j)
        uu = _l2_normalize(nn.relu(Dense(self.n_input, name="u")(u)))
        vv = _l2_normalize(nn.relu(Dense(self.n_input, name="v")(v)))
        c = nn.relu(Dense(self.n_input, name="c")(
            jnp.concatenate([uu, vv], axis=-1)))
        logits = Dense(2, name="s")(c)
        return logits, jax.nn.softmax(logits)


def score_all_pairs(score_fn, embeddings: Array, block: int = 128) -> Array:
    """[N, d] -> [N, N] similarity probabilities from a pair head.

    Replaces the reference's O(N^2) host loop of session.run PDDM evaluations
    (multimodal_model.py:459-475) with a blockwise device pass: rows are
    processed ``block`` at a time, each block scoring against the full set in
    one batched head evaluation (a few MXU matmuls).  ``score_fn(a, b)`` must
    return (logits, prob) for matched [M, d] tensors — e.g.
    ``functools.partial(model.apply, variables, method="score")``.
    """
    n, d = embeddings.shape
    pad = (-n) % block
    emb_pad = jnp.pad(embeddings, ((0, pad), (0, 0)))
    rows = emb_pad.reshape(-1, block, d)                    # [nb, B, d]

    def one_block(row_block):
        a = jnp.repeat(row_block, n, axis=0)                # [B*N, d]
        b = jnp.tile(embeddings, (block, 1))                # [B*N, d]
        _, prob = score_fn(a, b)
        return prob[:, 1].reshape(block, n)

    sims = jax.lax.map(one_block, rows).reshape(-1, n)      # [nb*B, N]
    return sims[:n]


def score_rows(score_fn, embeddings: Array, rows: Array,
               block: int = 2048) -> Array:
    """Similarity probabilities for SELECTED rows only: [H] indices ->
    [H, N], tiled over columns in ``block``-wide strips.

    The mega-batch path of the flagship's pseudo-similarity pass: device
    hard/structure mining only ever reads the sampled anchors' rows
    (ops/mining.py mine_hard_structure_triplets_rowwise), so scoring H rows
    costs O(H * N) head evaluations and memory instead of the O(N^2)
    full-matrix pass (reference scores ALL pairs host-side,
    multimodal_model.py:459-480).  ``score_fn`` as in
    :func:`score_all_pairs`.
    """
    n, d = embeddings.shape
    block = min(block, n)
    a = embeddings[rows]                                    # [H, d]
    h = a.shape[0]
    pad = (-n) % block
    emb_pad = jnp.pad(embeddings, ((0, pad), (0, 0)))
    tiles = emb_pad.reshape(-1, block, d)                   # [T, B, d]

    def one_tile(tile):
        aa = jnp.repeat(a, block, axis=0)                   # [H*B, d]
        bb = jnp.tile(tile, (h, 1))                         # [H*B, d]
        _, prob = score_fn(aa, bb)
        return prob[:, 1].reshape(h, block)

    sims = jax.lax.map(one_tile, tiles)                     # [T, H, B]
    return jnp.moveaxis(sims, 0, 1).reshape(h, -1)[:, :n]


def score_all_pairs_sym(score_fn, embeddings: Array,
                        block: int = 128) -> Array:
    """``score_all_pairs`` for SYMMETRIC heads: half the head evaluations.

    PDDM's pair features (u = |x_i - x_j|, v = (x_i + x_j)/2) and
    PairSim2's (squared difference) are swap-invariant, so
    score(a, b) == score(b, a) exactly and only the T(T+1)/2
    upper-triangle [block, block] tile pairs need evaluating; the lower
    triangle is the transposed mirror.  NOT valid for PairSim (concat
    order matters).
    """
    n, d = embeddings.shape
    pad = (-n) % block
    emb_pad = jnp.pad(embeddings, ((0, pad), (0, 0)))
    nb = emb_pad.shape[0] // block
    tiles = emb_pad.reshape(nb, block, d)
    ti, tj = np.triu_indices(nb)                            # static coords

    def one_pair(pair):
        a, b = pair                                         # [B, d] each
        aa = jnp.repeat(a, block, axis=0)
        bb = jnp.tile(b, (block, 1))
        _, prob = score_fn(aa, bb)
        return prob[:, 1].reshape(block, block)

    sims = jax.lax.map(one_pair, (tiles[ti], tiles[tj]))    # [P, B, B]
    out = jnp.zeros((nb, nb, block, block), sims.dtype)
    out = out.at[ti, tj].set(sims)
    mirror = jnp.swapaxes(jnp.swapaxes(out, 0, 1), 2, 3)
    diag = jnp.arange(nb)[:, None] == jnp.arange(nb)[None, :]
    full = out + jnp.where(diag[:, :, None, None], 0.0, mirror)
    full = full.transpose(0, 2, 1, 3).reshape(nb * block, nb * block)
    return full[:n, :n]
