"""Jitted step builders.

The reference's hot loop is a three-way host round trip per batch: embed all
events on device, copy to host, mine in NumPy, copy selected triplet
features back, forward+backward (base_model.py:258-287).  Here the whole
triangle is ONE jitted function: eval-mode embed for mining (stop-gradient),
on-device semi-hard mining, gather, train-mode re-forward of the selected
triplets, loss, grad, update.  Batches are fixed-shape (event budget +
mask), so each trainer compiles exactly once.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from multimodal_similarity_tpu.ops.distances import pairwise_distance
from multimodal_similarity_tpu.ops.losses import triplet_loss_masked
from multimodal_similarity_tpu.ops.mining import (
    mine_semihard_triplets,
    mine_semihard_triplets_from_embeddings,
)
from multimodal_similarity_tpu.train.state import TrainState, l2_regularization

Array = jnp.ndarray
_PAD_DIST = 1e30


def jit_step(step, **jit_kwargs):
    """jit a train step with the TrainState (argument 0) DONATED.

    Every step here is state -> state: donating lets XLA update params and
    both Adam moments in place instead of allocating a fresh copy per step
    — free HBM headroom equal to one full TrainState.  Callers must treat
    the passed-in state as consumed (`state, aux = step(state, ...)`), which
    every trainer loop already does.  Numerical equivalence with the
    undonated step is pinned by tests/test_train.py::test_donated_step_matches.
    """
    jit_kwargs.setdefault("donate_argnums", (0,))
    return jax.jit(step, **jit_kwargs)


def dequant_features(x):
    """Accept a dense feature array or the int8 feed's {"q", "scale"} dict
    (data/device_feed.quantize_features) and return bf16 features.

    Call at each CONSUMPTION site (not once per step): the embed pass's
    dequant fuses into its contraction (measured faster than a bf16 read),
    while a triplet gather must run on the int8 tensor via take_features —
    gathering a dequantized tensor forces XLA to materialize the full bf16
    copy in HBM, which is what made naive int8 slower than bf16.
    """
    if isinstance(x, dict) and "q" in x:
        return x["q"].astype(jnp.bfloat16) * x["scale"].astype(jnp.bfloat16)
    return x


def take_features(x, idx):
    """Row-gather that stays in the feed's storage dtype (int8 rows cost
    a quarter of f32 gather traffic); compose with dequant_features."""
    if isinstance(x, dict) and "q" in x:
        return {k: jnp.take(v, idx, axis=0) for k, v in x.items()}
    return jnp.take(x, idx, axis=0)


def l2_normalize(x: Array, eps: float = 1e-10) -> Array:
    # tf.nn.l2_normalize floors the squared SUM at epsilon (not epsilon^2):
    # x * rsqrt(max(sum(x^2), eps)).  Matching it exactly matters for
    # degenerate near-zero vectors (1e-20 < ss < 1e-10), which TF leaves
    # near zero instead of amplifying to unit norm.
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))


def masked_self_distance(emb: Array, mask: Array, metric: str) -> Array:
    """Self-distance with padding rows pushed to +inf off-diagonal."""
    d = pairwise_distance(emb, emb, metric)
    n = d.shape[0]
    d = d * (1.0 - jnp.eye(n, dtype=d.dtype))
    invalid = (1.0 - mask.astype(d.dtype))
    return d + invalid[None, :] * _PAD_DIST + invalid[:, None] * _PAD_DIST


def make_embed_fn(model, normalized: bool = True,
                  method=None) -> Callable:
    """Eval-mode embedding function (jitted)."""

    @jax.jit
    def embed(params, x):
        emb = model.apply({"params": params}, x, method=method)
        return l2_normalize(emb) if normalized else emb

    return embed


def embed_in_chunks(embed_fn, params, events, chunk: int = 256, beat=None):
    """Fixed-chunk embedding of a host or device array (one compile for
    any N; device inputs are sliced in place, never copied back to host)."""
    return embed_arrays_in_chunks(
        lambda *blocks: embed_fn(params, *blocks), (events,), chunk=chunk,
        beat=beat)


def embed_arrays_in_chunks(embed_fn, arrays, chunk: int = 256, beat=None):
    """Like embed_in_chunks for a row-aligned tuple of input arrays and a
    params-free ``embed_fn(*blocks)`` (the eval CLIs' closed-over-params
    jits, including two-modality fusions).

    ``beat`` (e.g. a StepWatchdog heartbeat) is called after each chunk's
    host readback: every chunk is real device progress, so a long
    validation over a big val set does not trip a step-sized hang
    deadline, while a wedged device still stops the beats within one
    chunk."""
    import numpy as np

    n = arrays[0].shape[0]
    out = []
    for start in range(0, n, chunk):
        blocks = []
        pad = 0
        for arr in arrays:
            block = jnp.asarray(arr[start:start + chunk])
            pad = chunk - block.shape[0]
            if pad:
                block = jnp.concatenate(
                    [block,
                     jnp.zeros((pad,) + block.shape[1:], block.dtype)])
            blocks.append(block)
        out.append(np.asarray(embed_fn(*blocks))[:chunk - pad or None])
        if beat is not None:
            beat()
    return np.concatenate(out, axis=0)[:n]


def make_triplet_train_step(
    model,
    *,
    triplet_per_batch: int,
    alpha: float = 0.2,
    num_negative: int = 3,
    metric: str = "squaredeuclidean",
    normalized: bool = True,
    lambda_l2: float = 0.0,
) -> Callable:
    """Fused embed -> mine -> re-forward -> triplet-loss step.

    Returns step(state, events, labels, mask, key, learning_rate) ->
    (state, metrics dict).  Mining runs on eval-mode embeddings
    (stop-gradient, dropout off) exactly as the reference mines on
    dropout-free embeddings (base_model.py:262); the gradient flows through
    a train-mode re-forward of only the selected triplets.
    """

    def step(state: TrainState, events, labels: Array, mask: Array,
             key: jax.Array, learning_rate: Array):
        k_mine, k_drop = jax.random.split(key)

        def loss_fn(params):
            emb_mine = model.apply({"params": params},
                                   dequant_features(events))
            if normalized:
                emb_mine = l2_normalize(emb_mine)
            emb_mine = jax.lax.stop_gradient(emb_mine)
            # row-wise mining: distances only for the sampled anchors, so
            # mining memory is O(P*N) rather than O(N^2)
            mined = mine_semihard_triplets_from_embeddings(
                emb_mine, labels, k_mine, triplet_per_batch, alpha=alpha,
                num_negative=num_negative, valid=mask, metric=metric)

            tri_idx = jnp.concatenate(
                [mined.anchor, mined.positive, mined.negative])
            # gather in the feed's storage dtype (int8 rows are 4x
            # cheaper), dequantizing only the selected triplets
            tri_events = dequant_features(take_features(events, tri_idx))
            tri_emb = model.apply({"params": params}, tri_events, train=True,
                                  rngs={"dropout": k_drop})
            if normalized:
                tri_emb = l2_normalize(tri_emb)
            t = mined.anchor.shape[0]
            a, p, n = tri_emb[:t], tri_emb[t:2 * t], tri_emb[2 * t:]
            metric_loss = triplet_loss_masked(a, p, n, mined.mask, alpha)
            total = metric_loss
            if lambda_l2:
                total = total + lambda_l2 * l2_regularization(params)
            aux = {
                "loss": total,
                "metric_loss": metric_loss,
                "active_count": mined.active_count,
                "triplet_num": jnp.sum(mined.mask),
            }
            return total, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, learning_rate=learning_rate)
        return state, aux

    return jit_step(step)


def make_gathered_triplet_step(
    model,
    *,
    alpha: float = 0.2,
    normalized: bool = True,
    lambda_l2: float = 0.0,
) -> Callable:
    """Step for host-mined triplets: feed [a; p; n]-ordered indices + mask.

    Mirrors the reference flow for --triplet_select random (host miner needs
    no embeddings).  step(state, events, tri_idx [3T], tri_mask [T], key,
    lr) -> (state, metrics)."""

    def step(state: TrainState, events: Array, tri_idx: Array,
             tri_mask: Array, key: jax.Array, learning_rate: Array):
        def loss_fn(params):
            tri_events = jnp.take(events, tri_idx, axis=0)
            emb = model.apply({"params": params}, tri_events, train=True,
                              rngs={"dropout": key})
            if normalized:
                emb = l2_normalize(emb)
            t = tri_mask.shape[0]
            a, p, n = emb[:t], emb[t:2 * t], emb[2 * t:]
            metric_loss = triplet_loss_masked(a, p, n, tri_mask, alpha)
            total = metric_loss
            if lambda_l2:
                total = total + lambda_l2 * l2_regularization(params)
            return total, {"loss": total, "metric_loss": metric_loss,
                           "triplet_num": jnp.sum(tri_mask)}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, learning_rate=learning_rate)
        return state, aux

    return jit_step(step)
