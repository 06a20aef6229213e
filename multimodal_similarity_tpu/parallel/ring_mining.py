"""Ring batch-hard mining: embedding shards rotate around the mesh.

The TPU-native counterpart of ring attention for this workload's long
axis — the N^2 similarity computations (SURVEY.md §5): each device holds
one shard of the embeddings; at every ring step it reduces its anchors
against the visiting shard (an MXU matmul + masked max/min) and forwards
the shard to its ICI neighbor via ppermute.  The N x N matrix never
exists, no device ever holds more than 2 shards, and per-step compute
overlaps the permute.  Combined with the fused Pallas kernel per tile this
scales mega-batch mining linearly in devices.

``ring_batch_hard_loss`` makes the ring pass trainable: a custom VJP
mirrors ops/pallas/batch_hard.py — the forward ring additionally tracks
each anchor's winning positive/negative GLOBAL index, and the backward
pass routes the loss gradient through those winning pairs only (the exact
gradient of the masked max/min), so no reverse-mode sweep through the
ppermute loop is ever needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_POS_INF = 1e30


def _ring_body(emb_l, lab_l, idx_l, *, axis: str, with_idx: bool):
    """Per-device ring reduction (runs under shard_map).

    The local shard is folded BEFORE the loop, so the ring performs only
    the n_dev - 1 rotations whose results are consumed (a fold-then-rotate
    loop would pay one extra ICI hop per pass whose output is discarded).
    Visit order per device is unchanged (own shard, then neighbors in ring
    order), so accumulation is bitwise identical.
    """
    n_dev = jax.lax.axis_size(axis)
    sq_l = jnp.sum(emb_l * emb_l, axis=1)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def fold(acc, visiting):
        fp, fpi, cn, cni, nc = acc
        emb_r, lab_r, idx_r, sq_r = visiting
        inner = jnp.dot(emb_l, emb_r.T, preferred_element_type=jnp.float32)
        dist = jnp.maximum(sq_l[:, None] + sq_r[None, :] - 2.0 * inner, 0.0)
        same = lab_l[:, None] == lab_r[None, :]
        eye = idx_l[:, None] == idx_r[None, :]
        pos_val = dist * (same & ~eye).astype(dist.dtype)
        neg_val = jnp.where(same, _POS_INF, dist)

        t_fp = jnp.max(pos_val, axis=1)
        t_cn = jnp.min(neg_val, axis=1)
        if with_idx:
            t_fpi = idx_r[jnp.argmax(pos_val, axis=1)]
            t_cni = idx_r[jnp.argmin(neg_val, axis=1)]
            fpi = jnp.where(t_fp > fp, t_fpi, fpi)
            cni = jnp.where(t_cn < cn, t_cni, cni)
        fp = jnp.maximum(fp, t_fp)
        cn = jnp.minimum(cn, t_cn)
        nc = nc + jnp.sum((~same).astype(dist.dtype), axis=1)
        return fp, fpi, cn, cni, nc

    def step(s, carry):
        acc, ring = carry
        # rotate the visiting shard to the next neighbor over ICI
        ring = tuple(jax.lax.ppermute(x, axis, perm) for x in ring)
        return fold(acc, ring), ring

    m = emb_l.shape[0]
    acc = (jnp.zeros((m,), jnp.float32),
           jnp.zeros((m,), jnp.int32),
           jnp.full((m,), _POS_INF, jnp.float32),
           jnp.zeros((m,), jnp.int32),
           jnp.zeros((m,), jnp.float32))
    ring = (emb_l, lab_l, idx_l, sq_l)
    acc = fold(acc, ring)
    (fp, fpi, cn, cni, nc), _ = jax.lax.fori_loop(0, n_dev - 1, step,
                                                  (acc, ring))
    return fp, fpi, cn, cni, nc


def _ring_stats(mesh: Mesh, embeddings, labels, axis: str, with_idx: bool):
    n = embeddings.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    fn = jax.shard_map(
        functools.partial(_ring_body, axis=axis, with_idx=with_idx),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis),) * 5,
        check_vma=False,
    )
    fp, fpi, cn, cni, nc = fn(embeddings.astype(jnp.float32),
                              labels.reshape(-1).astype(jnp.float32), idx)
    return fp, fpi, cn, cni, nc


def ring_batch_hard_stats(mesh: Mesh, embeddings, labels,
                          axis: str = "data"):
    """[N, d] sharded over ``axis`` -> (furthest_positive [N],
    closest_negative [N], neg_count [N]), all sharded the same way.

    Semantics identical to ops.pallas.fused_batch_hard_stats (squared
    euclidean, positives exclude self, negatives are label-inequality).
    Not differentiable — use :func:`ring_batch_hard_loss` for training.
    """
    fp, _, cn, _, nc = _ring_stats(mesh, embeddings, labels, axis, False)
    return fp, cn, nc


def make_ring_batch_hard_stats_grad(mesh: Mesh, axis: str = "data"):
    """Differentiable (emb, labels) -> (fp, cn, nc) via the ring pass.

    Custom VJP: gradients flow through each anchor's winning pair only —
    the exact gradient of the masked max/min (same scheme as
    ops/pallas/batch_hard.py:_stats_bwd).
    """

    @jax.custom_vjp
    def stats(emb, labels):
        fp, _, cn, _, nc = _ring_stats(mesh, emb, labels, axis, False)
        return fp, cn, nc

    def fwd(emb, labels):
        emb32 = emb.astype(jnp.float32)
        fp, fpi, cn, cni, nc = _ring_stats(mesh, emb32, labels, axis, True)
        return (fp, cn, nc), (emb32, fp, cn, fpi, cni)

    def bwd(res, grads):
        from multimodal_similarity_tpu.ops.pallas.batch_hard import (
            winning_pair_grad)
        emb, fp, cn, fpi, cni = res
        g_fp, g_cn, _ = grads
        return winning_pair_grad(emb, fp, cn, fpi, cni, g_fp, g_cn), None

    stats.defvjp(fwd, bwd)
    return stats


def make_ring_batch_hard_loss(mesh: Mesh, margin="soft",
                              weighted: bool = True, axis: str = "data"):
    """(emb [N, d] sharded over ``axis``, pids [N]) -> same tuple as
    ops.losses.batch_hard: (loss, num_active, diff, weights,
    furthest_positive, closest_negative).  Differentiable w.r.t. emb."""
    stats = make_ring_batch_hard_stats_grad(mesh, axis)

    def loss_fn(emb, pids):
        pids_f = pids.reshape(-1).astype(jnp.float32)
        fp, cn, neg_count = stats(emb, pids)
        diff = fp - cn
        if margin == "soft":
            diff = jax.nn.softplus(diff)
        else:
            diff = jnp.maximum(diff + margin, 0.0)
        foreground = (pids_f != 0.0).astype(jnp.float32)
        foreground_num = jnp.sum(foreground)
        if weighted:
            weights = neg_count * foreground
            weights = weights / jnp.sum(weights)
        else:
            weights = jnp.full_like(pids_f, 1.0 / pids_f.shape[0])
        loss = jnp.sum(diff * weights)
        num_active = jnp.sum((diff * foreground > 1e-5).astype(jnp.float32))
        num_active = num_active / foreground_num
        return loss, num_active, diff, weights, fp, cn

    return loss_fn
