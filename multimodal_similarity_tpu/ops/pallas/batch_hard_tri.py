"""Triangular fused distance + batch-hard reduction.

The pairwise squared-euclidean matrix is symmetric: dist(i, j) =
dist(j, i).  The row-streamed kernel (batch_hard.py) computes every
[TM, TN] tile of the full matrix; this variant visits only the
T*(T+1)/2 upper-triangle tiles and reduces each off-diagonal tile BOTH
ways — rows (anchors i, candidates j) and columns (anchors j,
candidates i) — halving the MXU contraction work for the same stats.

Mechanics:
  * 1-D grid over upper-triangle tile pairs; the (ti, tj) coordinates
    are scalar-prefetched (pltpu.PrefetchScalarGridSpec), and every
    BlockSpec index_map reads them, so consecutive steps with the same
    ti reuse the resident `a` block;
  * outputs are [T, block] accumulators living in VMEM across the whole
    grid (initialized at step 0, written back at the end) — row-side
    reductions update accumulator row ti, column-side reductions update
    row tj; diagonal tiles skip the column side (it would double-count);
  * anchors always carry REAL labels (invalid anchors still produce
    dense-oracle stats, masked downstream); candidates are folded the
    same way as the row-streamed kernel — sentinel labels exclude
    invalid columns from the positive set, and a +inf penalty column
    (added to the candidate axis) excludes them from the negative min.

Same return contract as batch_hard.fused_batch_hard_stats; the custom
VJP tracks each row's winning pair exactly like the row-streamed kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_similarity_tpu.ops.pallas.batch_hard import (
    _POS_INF,
    _prep_operands,
    _use_interpret,
)

Array = jnp.ndarray


def _tri_coords(n_tiles: int):
    """Upper-triangle tile pairs, row-major: a-tile reuse across the j
    sweep."""
    ti, tj = np.triu_indices(n_tiles)
    return (jnp.asarray(ti, jnp.int32), jnp.asarray(tj, jnp.int32))


def _unpack_side(side):
    """One packed [block, 8] stream carries all per-row scalars (six
    lanes used) — streaming them separately would cost a full 128-lane
    VMEM tile EACH and blow the budget (sq, pen, la real, le effective,
    g index, vb valid)."""
    return (side[:, 0:1], side[:, 1:2], side[:, 2:3], side[:, 3:4],
            side[:, 4:5], side[:, 5:6])


def _tile_sides(a, b, side_i, side_j):
    """dist + both reduction sides for one (i-tile, j-tile) pair.

    Returns (row side, col side) where each side is (pos, neg, mask)
    tile values, plus the two valid columns for the neg-count sums.
    """
    sq_i, pen_i, la_i, le_i, gi, vb_i = _unpack_side(side_i)
    sq_j, pen_j, la_j, le_j, gj, vb_j = _unpack_side(side_j)
    inner = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    cd = jnp.bfloat16 if a.dtype == jnp.bfloat16 else jnp.float32
    dist = jnp.maximum(
        sq_i.astype(cd) + sq_j.astype(cd).T - 2.0 * inner.astype(cd),
        jnp.asarray(0.0, cd))
    notself = gi != gj.T
    m_row = la_i == le_j.T           # anchors i over candidates j
    m_col = le_i == la_j.T           # anchors j over candidates i
    zero = jnp.asarray(0.0, cd)
    inf = jnp.asarray(_POS_INF, cd)
    pos_r = jnp.where(m_row & notself, dist, zero)
    neg_r = jnp.where(m_row, inf, dist + pen_j.astype(cd).T)
    pos_c = jnp.where(m_col & notself, dist, zero)
    neg_c = jnp.where(m_col, inf, dist + pen_i.astype(cd))
    return (pos_r, neg_r, m_row), (pos_c, neg_c, m_col), (vb_i, vb_j)


def _tri_kernel_noidx(ti_ref, tj_ref, a_ref, b_ref, sidei_ref, sidej_ref,
                      fp_ref, cn_ref, nc_ref):
    k = pl.program_id(0)
    ti = ti_ref[k]
    tj = tj_ref[k]

    @pl.when(k == 0)
    def _init():
        fp_ref[:] = jnp.zeros_like(fp_ref)
        cn_ref[:] = jnp.full_like(cn_ref, _POS_INF)
        nc_ref[:] = jnp.zeros_like(nc_ref)

    (pos_r, neg_r, m_row), (pos_c, neg_c, m_col), (vb_i, vb_j) = \
        _tile_sides(a_ref[:], b_ref[:], sidei_ref[:], sidej_ref[:])

    fp_r = jnp.max(pos_r, axis=1).astype(jnp.float32)[None, :]
    cn_r = jnp.min(neg_r, axis=1).astype(jnp.float32)[None, :]
    nc_r = jnp.sum(jnp.where(m_row, 0.0, vb_j.T), axis=1)[None, :]
    fp_ref[pl.ds(ti, 1), :] = jnp.maximum(fp_ref[pl.ds(ti, 1), :], fp_r)
    cn_ref[pl.ds(ti, 1), :] = jnp.minimum(cn_ref[pl.ds(ti, 1), :], cn_r)
    nc_ref[pl.ds(ti, 1), :] = nc_ref[pl.ds(ti, 1), :] + nc_r

    @pl.when(ti != tj)
    def _col_side():
        fp_c = jnp.max(pos_c, axis=0).astype(jnp.float32)[None, :]
        cn_c = jnp.min(neg_c, axis=0).astype(jnp.float32)[None, :]
        nc_c = jnp.sum(jnp.where(m_col, 0.0, vb_i), axis=0)[None, :]
        fp_ref[pl.ds(tj, 1), :] = jnp.maximum(fp_ref[pl.ds(tj, 1), :], fp_c)
        cn_ref[pl.ds(tj, 1), :] = jnp.minimum(cn_ref[pl.ds(tj, 1), :], cn_c)
        nc_ref[pl.ds(tj, 1), :] = nc_ref[pl.ds(tj, 1), :] + nc_c


def _tri_kernel_idx(ti_ref, tj_ref, a_ref, b_ref, sidei_ref, sidej_ref,
                    fp_ref, fpi_ref, cn_ref, cni_ref, nc_ref,
                    *, block: int):
    k = pl.program_id(0)
    ti = ti_ref[k]
    tj = tj_ref[k]

    @pl.when(k == 0)
    def _init():
        fp_ref[:] = jnp.zeros_like(fp_ref)
        fpi_ref[:] = jnp.zeros_like(fpi_ref)
        cn_ref[:] = jnp.full_like(cn_ref, _POS_INF)
        cni_ref[:] = jnp.zeros_like(cni_ref)
        nc_ref[:] = jnp.zeros_like(nc_ref)

    (pos_r, neg_r, m_row), (pos_c, neg_c, m_col), (vb_i, vb_j) = \
        _tile_sides(a_ref[:], b_ref[:], sidei_ref[:], sidej_ref[:])

    def commit(row, fp_t, fpa, cn_t, cna, nc_t):
        cur_fp = fp_ref[pl.ds(row, 1), :]
        better_fp = fp_t > cur_fp
        fp_ref[pl.ds(row, 1), :] = jnp.where(better_fp, fp_t, cur_fp)
        fpi_ref[pl.ds(row, 1), :] = jnp.where(
            better_fp, fpa, fpi_ref[pl.ds(row, 1), :])
        cur_cn = cn_ref[pl.ds(row, 1), :]
        better_cn = cn_t < cur_cn
        cn_ref[pl.ds(row, 1), :] = jnp.where(better_cn, cn_t, cur_cn)
        cni_ref[pl.ds(row, 1), :] = jnp.where(
            better_cn, cna, cni_ref[pl.ds(row, 1), :])
        nc_ref[pl.ds(row, 1), :] = nc_ref[pl.ds(row, 1), :] + nc_t

    # Mosaic's reduce-index only lowers for f32 lane-axis reductions —
    # cast before argmax/argmin; the column side must not transpose
    # tiles (tpu.transpose fails to legalize), so its winner indices are
    # recovered via a broadcasted row-iota + masked min instead
    pr32 = pos_r.astype(jnp.float32)
    nr32 = neg_r.astype(jnp.float32)
    tm, tn = pr32.shape
    fp_r = jnp.max(pr32, axis=1)[None, :]
    fpa_r = (jnp.argmax(pr32, axis=1).astype(jnp.int32)
             + tj * block)[None, :]
    cn_r = jnp.min(nr32, axis=1)[None, :]
    cna_r = (jnp.argmin(nr32, axis=1).astype(jnp.int32)
             + tj * block)[None, :]
    nc_r = jnp.sum(jnp.where(m_row, 0.0, vb_j.T), axis=1)[None, :]
    commit(ti, fp_r, fpa_r, cn_r, cna_r, nc_r)

    @pl.when(ti != tj)
    def _col_side():
        pc32 = pos_c.astype(jnp.float32)
        nc32 = neg_c.astype(jnp.float32)
        riota = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
        fp_c = jnp.max(pc32, axis=0)[None, :]
        win_fp = pc32 == fp_c
        fpa_c = (jnp.min(jnp.where(win_fp, riota, tm), axis=0)
                 .astype(jnp.int32) + ti * block)[None, :]
        cn_c = jnp.min(nc32, axis=0)[None, :]
        win_cn = nc32 == cn_c
        cna_c = (jnp.min(jnp.where(win_cn, riota, tm), axis=0)
                 .astype(jnp.int32) + ti * block)[None, :]
        nc_c = jnp.sum(jnp.where(m_col, 0.0, vb_i), axis=0)[None, :]
        commit(tj, fp_c, fpa_c, cn_c, cna_c, nc_c)


def _prep(emb, labels_f, valid_f, block, precision):
    """batch_hard's shared operand prep, repacked as one [*, 8] side
    stream per tile side: [sq, pen, la, le, g, vb, 0, 0] (an ADDITIVE
    penalty column replaces the penalized-norm form — each side serves as
    both anchor and candidate here)."""
    opd, sq, _sq_pen, lab, lab_eff, gidx, val, np_ = _prep_operands(
        emb, labels_f, valid_f, block, precision)
    pen = jnp.where(val <= 0.0, _POS_INF, 0.0)
    side = jnp.concatenate(
        [sq, pen, lab, lab_eff, gidx, val,
         jnp.zeros((np_, 2), jnp.float32)], axis=1)
    return opd, side, np_


def _tri_specs(block, d, n_tiles):
    i_ix = lambda k, ti, tj: (ti[k], 0)   # noqa: E731
    j_ix = lambda k, ti, tj: (tj[k], 0)   # noqa: E731
    in_specs = [
        pl.BlockSpec((block, d), i_ix, memory_space=pltpu.VMEM),  # a
        pl.BlockSpec((block, d), j_ix, memory_space=pltpu.VMEM),  # b
        pl.BlockSpec((block, 8), i_ix, memory_space=pltpu.VMEM),  # side i
        pl.BlockSpec((block, 8), j_ix, memory_space=pltpu.VMEM),  # side j
    ]
    acc = pl.BlockSpec((n_tiles, block), lambda k, ti, tj: (0, 0),
                       memory_space=pltpu.VMEM)
    return in_specs, acc


def _stats_tri(emb: Array, labels_f: Array, valid_f: Array, block: int,
               precision: str, with_idx: bool):
    n, d = emb.shape
    opd, side, np_ = _prep(emb, labels_f, valid_f, block, precision)
    n_tiles = np_ // block
    ti, tj = _tri_coords(n_tiles)
    in_specs, acc = _tri_specs(block, d, n_tiles)

    if with_idx:
        kernel = functools.partial(_tri_kernel_idx, block=block)
        out_shape = [
            jax.ShapeDtypeStruct((n_tiles, block), jnp.float32),  # fp
            jax.ShapeDtypeStruct((n_tiles, block), jnp.int32),    # fp idx
            jax.ShapeDtypeStruct((n_tiles, block), jnp.float32),  # cn
            jax.ShapeDtypeStruct((n_tiles, block), jnp.int32),    # cn idx
            jax.ShapeDtypeStruct((n_tiles, block), jnp.float32),  # nc
        ]
        n_out = 5
    else:
        kernel = _tri_kernel_noidx
        out_shape = [jax.ShapeDtypeStruct((n_tiles, block), jnp.float32)] * 3
        n_out = 3

    esize = 2 if precision == "bf16" else 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(int(n_tiles * (n_tiles + 1) // 2),),
        in_specs=in_specs,
        out_specs=[acc] * n_out,
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(np_ * np_ * d),  # half the full-matrix 2*N^2*D
            bytes_accessed=esize * 2 * np_ * d * max(n_tiles // 2, 1),
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(ti, tj, opd, opd, side, side)
    flat = [o.reshape(-1)[:n] for o in outs]
    if with_idx:
        fp, fpi, cn, cni, nc = flat
        return fp, cn, nc, fpi, cni
    fp, cn, nc = flat
    return fp, cn, nc
