"""Train steps that gather from the device-resident feature cache
INSIDE the jitted program.

The two-call cached path (data/device_cache.epoch_batches -> step) pays
a second program dispatch and an intermediate gathered batch per step;
on a high-latency link the dispatch alone is the difference between the
cached feed and the no-feed ceiling.  These steps take the cache's
resident operands as arguments (never closed over — a closed-over array
would embed hundreds of MB of constants in the executable) plus the
per-batch packed index plan, and run TSN gather -> embed -> mine ->
re-forward -> update as ONE program: a batch costs one small upload and
one dispatch, exactly like the on-device-data step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.ops.losses import triplet_loss_masked
from multimodal_similarity_tpu.ops.mining import (
    mine_semihard_triplets_from_embeddings)
from multimodal_similarity_tpu.train.state import l2_regularization
from multimodal_similarity_tpu.train.steps import (
    dequant_features, jit_step, l2_normalize, take_features)


def make_cached_triplet_step(
    model,
    cache,
    *,
    triplet_per_batch: int,
    alpha: float = 0.2,
    num_negative: int = 3,
    metric: str = "squaredeuclidean",
    normalized: bool = True,
    lambda_l2: float = 0.0,
    steps_per_dispatch: int = 1,
) -> Callable:
    """Fused gather+train step over a DeviceFeatureCache.

    Returns step(state, packed, key, learning_rate, *cache.step_operands())
    -> (state, aux).  ``packed`` is the [n_shards, per + 1] int32 plan
    from cache.epoch_plans(); the TSN offsets derive from ``key`` with
    the same fold structure as cache.epoch_batches, so the two paths
    select identical frames under identical keys (pinned in
    tests/test_device_cache.py).

    With ``steps_per_dispatch`` K > 1 the returned program is
    ``lax.scan`` of K whole gather+mine+train steps —
    ``(state, packed [K, ...], keys [K], lr, *operands) ->
    (state, aux-of-[K]-arrays)`` — one dispatch RPC per K optimizer
    steps, numerically identical to K sequential K=1 calls under the
    same key sequence (the cache operands are loop-invariant scan
    residuals, never copied per step).
    """
    mesh = cache.mesh
    gather_fn = cache.gather_fn

    def step(state, packed, key, learning_rate, seq_len, label_table,
             *mods):
        # split exactly like the two-call path (gather key, then the
        # step's own mine/dropout split), so this fused program is
        # numerically comparable to cache._gather + the plain step under
        # the same key — the parity test's oracle
        k_gather, k_rest = jax.random.split(key)
        k_mine, k_drop = jax.random.split(k_rest)
        if mesh is None:
            packed_local = packed[0] if packed.ndim == 2 else packed
            gathered, labels, mask = gather_fn(
                k_gather, packed_local, seq_len, label_table, *mods)
        else:
            gathered, labels, mask = gather_fn(
                k_gather, packed, seq_len, label_table, *mods)
        events = gathered[0]

        def loss_fn(params):
            emb_mine = model.apply({"params": params},
                                   dequant_features(events))
            if normalized:
                emb_mine = l2_normalize(emb_mine)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                emb_mine = jax.lax.with_sharding_constraint(
                    emb_mine, NamedSharding(mesh, P()))
            emb_mine = jax.lax.stop_gradient(emb_mine)
            mined = mine_semihard_triplets_from_embeddings(
                emb_mine, labels, k_mine, triplet_per_batch, alpha=alpha,
                num_negative=num_negative, valid=mask, metric=metric)

            tri_idx = jnp.concatenate(
                [mined.anchor, mined.positive, mined.negative])
            tri_events = dequant_features(take_features(events, tri_idx))
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                tri_events = jax.lax.with_sharding_constraint(
                    tri_events, NamedSharding(mesh, P("data")))
            tri_emb = model.apply({"params": params}, tri_events,
                                  train=True, rngs={"dropout": k_drop})
            if normalized:
                tri_emb = l2_normalize(tri_emb)
            t = mined.anchor.shape[0]
            a, p, n = tri_emb[:t], tri_emb[t:2 * t], tri_emb[2 * t:]
            loss = triplet_loss_masked(a, p, n, mined.mask, alpha)
            if lambda_l2:
                loss = loss + lambda_l2 * l2_regularization(params)
            return loss, {"loss": loss, "triplet_num": jnp.sum(mined.mask),
                          "active_count": mined.active_count}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, learning_rate=learning_rate)
        return state, aux

    return _jit_cached(step, cache, steps_per_dispatch)


def _jit_cached(step, cache, steps_per_dispatch: int):
    """Shared finalization for fused cached steps: jit with the state
    donated (+ mesh shardings when the cache is sharded), or the
    ``lax.scan``-of-K program when ``steps_per_dispatch`` > 1 (one
    dispatch RPC per K optimizer steps; the cache operands ride as
    loop-invariant residuals, never copied per step)."""
    mesh = cache.mesh
    if steps_per_dispatch > 1:
        def multi(state, packed_k, keys_k, learning_rate, seq_len,
                  label_table, *mods):
            def body(st, xs):
                packed, key = xs
                return step(st, packed, key, learning_rate, seq_len,
                            label_table, *mods)
            return jax.lax.scan(body, state, (packed_k, keys_k))

        if mesh is None:
            return jit_step(multi)
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        packed_ks = NamedSharding(mesh, P(None, "data", None))
        row = lambda a: NamedSharding(  # noqa: E731
            mesh, P("data", *([None] * (a.ndim - 1))))
        operand_s = tuple(row(a) for a in cache.step_operands())
        return jit_step(multi, in_shardings=(None, packed_ks, repl, repl,
                                             *operand_s))

    if mesh is None:
        return jit_step(step)
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    packed_s = NamedSharding(mesh, P("data", None))
    row = lambda a: NamedSharding(  # noqa: E731
        mesh, P("data", *([None] * (a.ndim - 1))))
    operand_s = tuple(row(a) for a in cache.step_operands())
    return jit_step(step, in_shardings=(None, packed_s, repl, repl,
                                        *operand_s))


def dispatch_plan_window(state, win, keys, lr, *, fused, multi, k,
                         plan_args, extra_args=(), cache_ops=(),
                         put_plans=None):
    """One window of cached-batch plans through the right program.

    A full-K window rides the scanned ``--steps_per_dispatch`` program
    (ONE dispatch for K optimizer steps); a short window — the epoch
    tail, or a trainer without the scanned program (``multi`` None) —
    rides the K=1 fused step, so no batch is ever dropped.  This is the
    single copy of the stack/de-interleave mechanics every cached
    trainer loop shares: ``plan_args(plan)`` yields the per-plan host
    arrays in the fused step's positional order (stacked along a new
    leading K axis for the scanned form), ``extra_args`` are non-plan
    operands sitting between them and the PRNG key (e.g. the flagship's
    class-margin table), ``keys`` is one PRNG key per plan.
    ``put_plans`` (pass ``cache.put_plans``) converts the packed plan
    into a global array under --multihost — identity on single-process
    runs, so callers wire it unconditionally.  Returns
    ``(state, aux_list)`` with one device-scalars dict per optimizer
    step, in step order.
    """
    if multi is not None and len(win) == k:
        stacked = tuple(
            np.stack(c) for c in zip(*(plan_args(p) for p in win)))
        if put_plans is not None:
            # --multihost: the packed plan must become a global array
            # before the multi-process jit sees it (cache.put_plans;
            # identity on single-process runs)
            stacked = put_plans(stacked, scanned=True)
        state, auxs = multi(state, *stacked, *extra_args,
                            jnp.stack(list(keys)), jnp.float32(lr),
                            *cache_ops)
        return state, [{n: v[i] for n, v in auxs.items()}
                       for i in range(len(win))]
    aux_list = []
    for p, key in zip(win, keys):
        args = plan_args(p)
        if put_plans is not None:
            args = put_plans(args)
        state, aux = fused(state, *args, *extra_args, key,
                           jnp.float32(lr), *cache_ops)
        aux_list.append(aux)
    return state, aux_list


def make_cached_body_step(body, cache, *, steps_per_dispatch: int = 1):
    """Fuse ANY trainer's step body over a DeviceFeatureCache.

    ``body(state, events_tuple, labels, mask, key, learning_rate) ->
    (state, aux)`` is the trainer's UN-JITTED update; ``events_tuple``
    carries one entry per cached modality in the cache's storage form —
    the int8 feed dict ``{"q", "scale"}`` for TSN modalities, a dense
    pooled array for ``meanpool`` modalities — exactly what
    ``cache.epoch_batches`` yields, so bodies written against
    train/steps.dequant_features / take_features consume the streamed
    and the cached feed identically.

    Returns ``step(state, packed, key, lr, *cache.step_operands())``
    jitted with the state donated; with ``steps_per_dispatch`` K > 1 the
    ``lax.scan``-of-K program (``packed`` [K, ...], ``key`` [K]).  The
    key splits once into (gather, body) halves — the same structure as
    the two-call path (gather under ``key``'s first split, the body
    under the second), which is the parity oracle in
    tests/test_device_cache.py.
    """
    mesh = cache.mesh
    gather_fn = cache.gather_fn

    def step(state, packed, key, learning_rate, seq_len, label_table,
             *mods):
        k_gather, k_body = jax.random.split(key)
        if mesh is None:
            packed_local = packed[0] if packed.ndim == 2 else packed
            gathered, labels, mask = gather_fn(
                k_gather, packed_local, seq_len, label_table, *mods)
        else:
            gathered, labels, mask = gather_fn(
                k_gather, packed, seq_len, label_table, *mods)
        return body(state, gathered, labels, mask, k_body, learning_rate)

    return _jit_cached(step, cache, steps_per_dispatch)
