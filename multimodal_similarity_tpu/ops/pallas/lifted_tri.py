"""Triangular fused lifted-structured statistics (bounded-value fast path).

Round-3 rework of the lifted forward, driven by two measurements on the
v5e (see docs/KERNELS.md "lifted roofline"):

1. The row-streamed lifted kernel is NOT transcendental-bound: replacing
   every ``jnp.exp`` with a multiply moves the N=8192/d=128 forward by
   only ~3% (1.913 -> 1.856 ms).  The cost is the per-element VPU work —
   distance assembly, mask/value construction, and the max+sum reduction
   passes — done once per FULL-matrix tile.
2. The pairwise value matrices are symmetric (dist, label-equality, and
   validity all are), so the triangular tile walk of
   ops/pallas/batch_hard_tri.py applies: visit only the T(T+1)/2
   upper-triangle tiles, build dist/masks/values ONCE per tile, and
   reduce both ways (rows -> anchors i, columns -> anchors j).

This variant additionally drops logsumexp max-tracking entirely: the
trainers feed L2-NORMALIZED embeddings, so squared-euclidean distances
lie in [0, 4], v_pos in {-inf} ∪ [0, 4] and v_neg in {-inf} ∪
[margin - 4, margin] — ``exp`` cannot overflow and the plain running SUM
of exponentials is exactly logsumexp (fp = log Σ exp v).  That removes
both per-tile max reductions, the exp-rescaled online merges, and two of
the five accumulator planes.  Callers with unnormalized embeddings must
use the general row kernel (ops/pallas/lifted.py) — enforced by the
``bounded`` dispatch in fused_lifted_stats.

Reference semantics preserved exactly (networks.py:835-870), including
the exp(0) contribution of valid non-positives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_similarity_tpu.ops.pallas.batch_hard import (
    _POS_INF,
    _use_interpret,
)
from multimodal_similarity_tpu.ops.pallas.batch_hard_tri import (
    _prep,
    _tri_coords,
    _tri_specs,
    _unpack_side,
)

Array = jnp.ndarray


def _lifted_tile_shared(a, b, side_i, side_j, margin):
    """SHARED exponential tiles for one (i-tile, j-tile) pair.

    Bounded values let validity fold in MULTIPLICATIVELY (exp(-inf) == 0
    == exp(v) * 0), so both reduction sides reuse ONE pair of exp tiles:

      P  = exp(where(eq & notself, dist, 0))      positives + exp(0) quirk
      Ng = where(eq, 0, exp(margin - dist))        negatives

    Row side weights columns by vb_j, col side weights rows by vb_i.
    Label equality uses REAL labels on both sides: invalid entries may
    classify arbitrarily, but their contribution is zeroed by the vb
    factor either way.  dist is symmetric, so P and Ng serve anchors i
    (rows) and anchors j (columns) simultaneously — this is where the
    triangular walk actually halves the elementwise+transcendental work
    (a v-matrix-per-side formulation recomputes the exps and wins
    nothing; measured on v5e).
    """
    sq_i, _pen_i, la_i, _le_i, gi, vb_i = _unpack_side(side_i)
    sq_j, _pen_j, la_j, _le_j, gj, vb_j = _unpack_side(side_j)
    inner = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    cd = jnp.bfloat16 if a.dtype == jnp.bfloat16 else jnp.float32
    dist = jnp.maximum(
        sq_i.astype(cd) + sq_j.astype(cd).T - 2.0 * inner.astype(cd),
        jnp.asarray(0.0, cd))
    eq = la_i == la_j.T
    notself = gi != gj.T
    zero = jnp.asarray(0.0, cd)
    mar = jnp.asarray(margin, cd)

    p = jnp.exp(jnp.where(eq & notself, dist, zero)).astype(jnp.float32)
    ng = jnp.where(eq, zero, jnp.exp(mar - dist)).astype(jnp.float32)
    nm = jnp.where(eq, 0.0, 1.0)
    w_i = vb_i.astype(jnp.float32)            # [TM, 1]
    w_j = vb_j.astype(jnp.float32).T          # [1, TN]
    return p, ng, nm, w_i, w_j


def _tri_lifted_kernel(ti_ref, tj_ref, a_ref, b_ref, sidei_ref, sidej_ref,
                       fps_ref, cns_ref, nc_ref, *, margin: float):
    k = pl.program_id(0)
    ti = ti_ref[k]
    tj = tj_ref[k]

    @pl.when(k == 0)
    def _init():
        fps_ref[:] = jnp.zeros_like(fps_ref)
        cns_ref[:] = jnp.zeros_like(cns_ref)
        nc_ref[:] = jnp.zeros_like(nc_ref)

    p, ng, nm, w_i, w_j = _lifted_tile_shared(
        a_ref[:], b_ref[:], sidei_ref[:], sidej_ref[:], margin)

    # bounded values: exp never overflows, plain sums ARE the logsumexp
    fps_ref[pl.ds(ti, 1), :] += jnp.sum(p * w_j, axis=1)[None, :]
    cns_ref[pl.ds(ti, 1), :] += jnp.sum(ng * w_j, axis=1)[None, :]
    nc_ref[pl.ds(ti, 1), :] += jnp.sum(nm * w_j, axis=1)[None, :]

    @pl.when(ti != tj)
    def _col_side():
        fps_ref[pl.ds(tj, 1), :] += jnp.sum(p * w_i, axis=0)[None, :]
        cns_ref[pl.ds(tj, 1), :] += jnp.sum(ng * w_i, axis=0)[None, :]
        nc_ref[pl.ds(tj, 1), :] += jnp.sum(nm * w_i, axis=0)[None, :]


def lifted_fwd_tri(emb: Array, labels_f: Array, valid_f: Array,
                   margin: float, block: int, precision: str):
    """-> (fp, cn, neg_count), each [N] f32.

    REQUIRES bounded value matrices (l2-normalized embeddings): callers
    go through fused_lifted_stats(..., bounded=True).
    """
    n, d = emb.shape
    opd, side, np_ = _prep(emb, labels_f, valid_f, block, precision)
    n_tiles = np_ // block
    ti, tj = _tri_coords(n_tiles)
    in_specs, acc = _tri_specs(block, d, n_tiles)

    esize = 2 if precision == "bf16" else 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(int(n_tiles * (n_tiles + 1) // 2),),
        in_specs=in_specs,
        out_specs=[acc] * 3,
    )
    outs = pl.pallas_call(
        functools.partial(_tri_lifted_kernel, margin=margin),
        out_shape=[jax.ShapeDtypeStruct((n_tiles, block), jnp.float32)] * 3,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(np_ * np_ * d),  # half the full-matrix 2*N^2*d
            bytes_accessed=esize * 2 * np_ * d * max(n_tiles // 2, 1),
            transcendentals=int(np_ * np_),  # one exp per element per side
        ),
        interpret=_use_interpret(),
    )(ti, tj, opd, opd, side, side)
    fps, cns, nc = [o.reshape(-1)[:n] for o in outs]
    fp = jnp.log(jnp.maximum(fps, 1e-30))
    cn = jnp.log(jnp.maximum(cns, 1e-30))
    return fp, cn, nc
