"""Data-parallel training step.

Batch axis sharded over the ``data`` mesh axis; parameters replicated.  The
step body is the same fused embed -> mine -> re-forward -> loss triangle as
the single-chip step (train/steps.py); sharding annotations on inputs plus
with_sharding_constraint on the embeddings let XLA's SPMD partitioner run
the encoder batch-parallel, all-gather the (small) embedding matrix over ICI
for the global O(P*N) rowwise mining, and reduce the gradients with a psum — no
hand-written collectives on this path (the Pallas ring variants live in
ops/pallas for the cases XLA can't fuse).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_similarity_tpu.ops.losses import triplet_loss_masked
from multimodal_similarity_tpu.ops.mining import (
    mine_semihard_triplets_from_embeddings)
from multimodal_similarity_tpu.train.steps import (
    jit_step,
    l2_normalize,
)


def make_dp_triplet_step(
    model,
    mesh: Mesh,
    *,
    triplet_per_batch: int,
    alpha: float = 0.2,
    num_negative: int = 3,
    metric: str = "squaredeuclidean",
    normalized: bool = True,
    lambda_l2: float = 0.0,
    gather_smalls: bool = False,
) -> Callable:
    """step(state, events, labels, mask, key, lr) with events sharded on the
    batch axis over mesh axis 'data' and state replicated.

    ``gather_smalls=True`` is the MULTIHOST feeding mode: labels and mask
    arrive sharded on the batch axis too (each host only holds its local
    rows — parallel/multihost.make_global_batch), and the step gathers
    them to replicated before the global mining pass (XLA inserts the
    all-gather; labels/mask are a few KB, so the collective is noise)."""
    data_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def step(state, events, labels, mask, key, learning_rate):
        from multimodal_similarity_tpu.train.steps import (
            dequant_features, take_features)
        k_mine, k_drop = jax.random.split(key)
        if gather_smalls:
            labels = jax.lax.with_sharding_constraint(labels, repl)
            mask = jax.lax.with_sharding_constraint(mask, repl)

        def loss_fn(params):
            emb = model.apply({"params": params}, dequant_features(events))
            if normalized:
                emb = l2_normalize(emb)
            # embeddings gathered for the global mining pass
            emb = jax.lax.with_sharding_constraint(
                emb, NamedSharding(mesh, P()))
            emb = jax.lax.stop_gradient(emb)
            # O(P*N) rowwise miner (bit-identical sampling to the matrix
            # variant under the same key) — the [N, N] distance matrix
            # would be replicated per chip and OOM at mega-batch N
            mined = mine_semihard_triplets_from_embeddings(
                emb, labels, k_mine, triplet_per_batch, alpha=alpha,
                num_negative=num_negative, valid=mask, metric=metric)

            tri_idx = jnp.concatenate(
                [mined.anchor, mined.positive, mined.negative])
            # gather in the feed's storage dtype, dequantize the selection
            tri_events = dequant_features(take_features(events, tri_idx))
            tri_events = jax.lax.with_sharding_constraint(
                tri_events, NamedSharding(mesh, P("data")))
            tri_emb = model.apply({"params": params}, tri_events, train=True,
                                  rngs={"dropout": k_drop})
            if normalized:
                tri_emb = l2_normalize(tri_emb)
            t = mined.anchor.shape[0]
            a, p, n = tri_emb[:t], tri_emb[t:2 * t], tri_emb[2 * t:]
            loss = triplet_loss_masked(a, p, n, mined.mask, alpha)
            if lambda_l2:
                from multimodal_similarity_tpu.train.state import (
                    l2_regularization)
                loss = loss + lambda_l2 * l2_regularization(params)
            return loss, {"loss": loss, "triplet_num": jnp.sum(mined.mask),
                          "active_count": mined.active_count}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, learning_rate=learning_rate)
        return state, aux

    small = data_sharding if gather_smalls else repl
    in_shardings = (None,                      # state: leave placement as-is
                    data_sharding,             # events
                    small, small, repl, repl)  # labels, mask, key, lr
    return jit_step(step, in_shardings=in_shardings)
