"""Ring batch-hard mining: embedding shards rotate around the mesh.

The TPU-native counterpart of ring attention for this workload's long
axis — the N^2 similarity computations (SURVEY.md §5): each device holds
one shard of the embeddings; at every ring step it reduces its anchors
against the visiting shard (an MXU matmul + masked max/min) and forwards
the shard to its ICI neighbor via ppermute.  The N x N matrix never
exists, no device ever holds more than 2 shards, and per-step compute
overlaps the permute.  Combined with the fused Pallas kernel per tile this
scales mega-batch mining linearly in devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_POS_INF = 1e30


def ring_batch_hard_stats(mesh: Mesh, embeddings, labels,
                          axis: str = "data"):
    """[N, d] sharded over ``axis`` -> (furthest_positive [N],
    closest_negative [N], neg_count [N]), all sharded the same way.

    Semantics identical to ops.pallas.fused_batch_hard_stats (squared
    euclidean, positives exclude self, negatives are label-inequality).
    """
    n = embeddings.shape[0]

    def body(emb_l, lab_l, idx_l):
        n_dev = jax.lax.axis_size(axis)
        me = jax.lax.axis_index(axis)

        def step(s, carry):
            fp, cn, nc, emb_r, lab_r, idx_r = carry
            sq_l = jnp.sum(emb_l * emb_l, axis=1)
            sq_r = jnp.sum(emb_r * emb_r, axis=1)
            inner = jnp.dot(emb_l, emb_r.T,
                            preferred_element_type=jnp.float32)
            dist = jnp.maximum(sq_l[:, None] + sq_r[None, :] - 2.0 * inner,
                               0.0)
            same = lab_l[:, None] == lab_r[None, :]
            eye = idx_l[:, None] == idx_r[None, :]
            pos_m = same & ~eye
            neg_m = ~same
            fp = jnp.maximum(fp, jnp.max(
                dist * pos_m.astype(dist.dtype), axis=1))
            cn = jnp.minimum(cn, jnp.min(
                jnp.where(neg_m, dist, _POS_INF), axis=1))
            nc = nc + jnp.sum(neg_m.astype(dist.dtype), axis=1)
            # rotate the visiting shard to the next neighbor over ICI
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            emb_r = jax.lax.ppermute(emb_r, axis, perm)
            lab_r = jax.lax.ppermute(lab_r, axis, perm)
            idx_r = jax.lax.ppermute(idx_r, axis, perm)
            return fp, cn, nc, emb_r, lab_r, idx_r

        m = emb_l.shape[0]
        init = (jnp.zeros((m,), jnp.float32),
                jnp.full((m,), _POS_INF, jnp.float32),
                jnp.zeros((m,), jnp.float32),
                emb_l, lab_l, idx_l)
        fp, cn, nc, *_ = jax.lax.fori_loop(0, n_dev, step, init)
        return fp, cn, nc

    idx = jnp.arange(n, dtype=jnp.int32)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return fn(embeddings.astype(jnp.float32),
              labels.reshape(-1).astype(jnp.float32), idx)
