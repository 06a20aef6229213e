"""Fused lifted-structured statistics: online-logsumexp over distance tiles.

Per anchor row i (reference semantics, networks.py:835-870):
  fp_i = logsumexp_j( dist_ij * pos_mask_ij )   (non-positives contribute
                                                 exp(0) — the trained
                                                 objective, kept exactly)
  cn_i = logsumexp_{j: neg} ( margin - dist_ij )

computed FlashAttention-style: each [TM, d] x [TN, d] tile issues one MXU
matmul and folds into running (max, sum-exp) accumulators — the N x N
matrix never exists in HBM.

Performance structure mirrors ops/pallas/batch_hard.py: row norms are
precomputed in f32 outside the kernel, validity is folded into a
column-label sentinel + a +inf-penalized column norm (margin - dist then
lands at -inf for invalid columns with no extra mask algebra), the
self-pair exclusion compares streamed global-index columns instead of
generating per-tile iotas, and bf16 operand tiles are cast once on the
host side (f32 MXU accumulation).

The custom VJP recomputes tiles (no residual matrix): with
  C_ij = g_fp_i * softmax^pos_ij * pos_mask_ij
       - g_cn_i * softmax^neg_ij * neg_mask_ij
  (softmaxes reconstructed from the saved row logsumexps),
d dist_ij / d e_i = 2 (e_i - e_j) gives
  grad_i = 2 * (rowsum(C)_i * e_i - (C @ E)_i)
         + 2 * (colsum(C)_i * e_i - (C^T @ E)_i),
accumulated in two symmetric tile passes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_similarity_tpu.ops.pallas.batch_hard import (
    _INVALID_LABEL,
    _POS_INF,
    _dense_label_ids,
    _prep_operands,
    _use_interpret,
)

Array = jnp.ndarray
_NEG_INF = -1e30


def _tile_values(a, b, sqa, sqbp, la, lb_eff, gi, gj, vb, margin):
    """dist tile + masks + the two value matrices (v_pos, v_neg).

    ``la`` are real row labels, ``lb_eff`` sentinel-encoded column labels
    (invalid -> never equal), ``sqbp`` +inf-penalized column norms,
    ``gi``/``gj`` streamed global row/col index columns for the self-pair
    exclusion (one compare per element; a lax.cond over a full tile
    breaks Mosaic's vector-carry limits).
    """
    inner = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    # bf16 operands -> bf16 post-matmul tile math: 16x128 vreg packing
    # doubles VPU throughput on the per-element masking/exp work (the
    # online-logsumexp accumulators stay f32; see ops/pallas/batch_hard.py)
    cd = jnp.bfloat16 if a.dtype == jnp.bfloat16 else jnp.float32
    dist = jnp.maximum(
        sqa.astype(cd) + sqbp.astype(cd).T - 2.0 * inner.astype(cd),
        jnp.asarray(0.0, cd))
    same = la == lb_eff.T
    pos_m = same & (gi != gj.T)
    # valid non-positives contribute exp(0) (reference quirk); invalid
    # columns -inf; true positives their (unpenalized == real) distance
    v_pos = (jnp.where(pos_m, dist, jnp.asarray(0.0, cd))
             - (jnp.asarray(1.0, cd) - vb.astype(cd).T)
             * jnp.asarray(_POS_INF, cd))
    # invalid columns already sit at margin - ~1e30 via the norm penalty
    v_neg = jnp.where(same, jnp.asarray(_NEG_INF, cd),
                      jnp.asarray(margin, cd) - dist)
    neg_m = jnp.where(same, 0.0, vb.T)
    return pos_m, neg_m, v_pos, v_neg


def _fwd_kernel(a_ref, b_ref, sqa_ref, sqbp_ref, la_ref, lb_ref,
                gi_ref, gj_ref, vb_ref,
                fp_m_ref, fp_s_ref, cn_m_ref, cn_s_ref, nc_ref,
                *, margin: float, block: int):
    j = pl.program_id(1)
    _, neg_m, v_pos, v_neg = _tile_values(
        a_ref[:], b_ref[:], sqa_ref[:], sqbp_ref[:], la_ref[:], lb_ref[:],
        gi_ref[:], gj_ref[:], vb_ref[:], margin)

    def online(m_ref, s_ref, v):
        t_max = jnp.max(v, axis=1, keepdims=True)
        t_sum = jnp.sum(jnp.exp(v - t_max).astype(jnp.float32), axis=1,
                        keepdims=True)
        t_max = t_max.astype(jnp.float32)

        @pl.when(j == 0)
        def _():
            m_ref[:] = t_max
            s_ref[:] = t_sum

        @pl.when(j != 0)
        def _():
            new_m = jnp.maximum(m_ref[:], t_max)
            s_ref[:] = (s_ref[:] * jnp.exp(m_ref[:] - new_m)
                        + t_sum * jnp.exp(t_max - new_m))
            m_ref[:] = new_m

    online(fp_m_ref, fp_s_ref, v_pos)
    online(cn_m_ref, cn_s_ref, v_neg)

    t_nc = jnp.sum(neg_m, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        nc_ref[:] = t_nc

    @pl.when(j != 0)
    def _():
        nc_ref[:] = nc_ref[:] + t_nc


def _bwd_kernel(a_ref, b_ref, sqa_ref, sqb_ref, sqap_ref, sqbp_ref,
                la_ref, lb_ref, lae_ref, lbe_ref, gi_ref, gj_ref,
                va_ref, vb_ref,
                fp_ref, cn_ref, gfp_ref, gcn_ref, grad_ref,
                *, margin: float, block: int, transpose: bool):
    """One directional pass: accumulates the row-side (or, with
    ``transpose``, the column-side) gradient contribution for the a-block.

    With transpose=True the roles swap: the grid's first axis indexes the
    COLUMN block of the conceptual matrix, and C^T is applied; fp/cn/g
    then belong to the b-block rows.
    """
    j = pl.program_id(1)
    a = a_ref[:]
    b = b_ref[:]
    if not transpose:
        pos_m, neg_m, v_pos, v_neg = _tile_values(
            a, b, sqa_ref[:], sqbp_ref[:], la_ref[:], lbe_ref[:],
            gi_ref[:], gj_ref[:], vb_ref[:], margin)
        soft_pos = jnp.exp(v_pos.astype(jnp.float32) - fp_ref[:]) \
            * pos_m.astype(jnp.float32)
        soft_neg = jnp.exp(v_neg.astype(jnp.float32) - cn_ref[:]) * neg_m
        c = gfp_ref[:] * soft_pos - gcn_ref[:] * soft_neg     # [TM, TN]
        rowsum = jnp.sum(c, axis=1, keepdims=True)
        contrib = 2.0 * (rowsum * a.astype(jnp.float32) - jax.lax.dot_general(
            c.astype(b.dtype), b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    else:
        # conceptual (k = b rows, i = a rows as columns): C_kb with fp/cn/g
        # of the b-block; accumulate 2 * (colsum * a - C^T @ E_k)
        pos_m, neg_m, v_pos, v_neg = _tile_values(
            b, a, sqb_ref[:], sqap_ref[:], lb_ref[:], lae_ref[:],
            gj_ref[:], gi_ref[:], va_ref[:], margin)
        soft_pos = jnp.exp(v_pos.astype(jnp.float32) - fp_ref[:]) \
            * pos_m.astype(jnp.float32)
        soft_neg = jnp.exp(v_neg.astype(jnp.float32) - cn_ref[:]) * neg_m
        c = gfp_ref[:] * soft_pos - gcn_ref[:] * soft_neg     # [TN(k), TM(i)]
        colsum = jnp.sum(c, axis=0)[:, None]                  # [TM, 1]
        contrib = 2.0 * (colsum * a.astype(jnp.float32) - jax.lax.dot_general(
            c.T.astype(b.dtype), b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))

    @pl.when(j == 0)
    def _():
        grad_ref[:] = contrib

    @pl.when(j != 0)
    def _():
        grad_ref[:] = grad_ref[:] + contrib


def _row_spec(block):
    return pl.BlockSpec((block, 1), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)


def _col_spec(block):
    return pl.BlockSpec((block, 1), lambda i, j: (j, 0),
                        memory_space=pltpu.VMEM)


def _lifted_fwd_pallas(emb, labels_f, valid_f, margin, block, precision):
    opd, sq, sq_pen, lab, lab_eff, gidx, val, np_ = _prep_operands(
        emb, labels_f, valid_f, block, precision)
    d = emb.shape[1]
    grid = (np_ // block, np_ // block)
    esize = 2 if precision == "bf16" else 4
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, margin=margin, block=block),
        out_shape=[jax.ShapeDtypeStruct((np_, 1), jnp.float32)] * 5,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(block),     # sq_a (unpenalized)
            _col_spec(block),     # sq_b penalized
            _row_spec(block),     # la real
            _col_spec(block),     # lb sentinel-encoded
            _row_spec(block),     # gi
            _col_spec(block),     # gj
            _col_spec(block),     # vb
        ],
        out_specs=[_row_spec(block)] * 5,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * np_ * d,
            bytes_accessed=esize * 2 * np_ * d + 4 * 8 * np_,
            transcendentals=2 * np_ * np_,
        ),
        interpret=_use_interpret(),
    )(opd, opd, sq, sq_pen, lab, lab_eff, gidx, gidx, val)
    fp_m, fp_s, cn_m, cn_s, nc = outs
    n = emb.shape[0]
    fp = (fp_m + jnp.log(jnp.maximum(fp_s, 1e-30)))[:n, 0]
    cn = (cn_m + jnp.log(jnp.maximum(cn_s, 1e-30)))[:n, 0]
    return fp, cn, nc[:n, 0]


def _lifted_bwd_pallas(emb, labels_f, valid_f, fp, cn, g_fp, g_cn, margin,
                       block, transpose, precision):
    opd, sq, sq_pen, lab, lab_eff, gidx, val, np_ = _prep_operands(
        emb, labels_f, valid_f, block, precision)
    d = emb.shape[1]
    n = emb.shape[0]
    pad = np_ - n

    def pad_col(v):
        return jnp.pad(v.reshape(-1), ((0, pad),)).reshape(-1, 1)

    fp_p, cn_p = pad_col(fp), pad_col(cn)
    gfp_p, gcn_p = pad_col(g_fp), pad_col(g_cn)
    grid = (np_ // block, np_ // block)
    # row stats belong to the conceptual-C row block: the a-block in the
    # straight pass, the b-block in the transposed pass
    stat_ix = (lambda i, j: (i, 0)) if not transpose else \
        (lambda i, j: (j, 0))
    stat_spec = pl.BlockSpec((block, 1), stat_ix, memory_space=pltpu.VMEM)
    grad = pl.pallas_call(
        functools.partial(_bwd_kernel, margin=margin, block=block,
                          transpose=transpose),
        out_shape=jax.ShapeDtypeStruct((np_, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(block),     # sq_a
            _col_spec(block),     # sq_b
            _row_spec(block),     # sq_a penalized
            _col_spec(block),     # sq_b penalized
            _row_spec(block),     # la real
            _col_spec(block),     # lb real
            _row_spec(block),     # la sentinel-encoded
            _col_spec(block),     # lb sentinel-encoded
            _row_spec(block),     # gi
            _col_spec(block),     # gj
            _row_spec(block),     # va
            _col_spec(block),     # vb
            stat_spec, stat_spec, stat_spec, stat_spec,
        ],
        out_specs=pl.BlockSpec((block, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(opd, opd, sq, sq, sq_pen, sq_pen, lab, lab, lab_eff, lab_eff,
      gidx, gidx, val, val, fp_p, cn_p, gfp_p, gcn_p)
    return grad[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_lifted_stats(emb: Array, labels: Array,
                       valid: Optional[Array] = None,
                       margin: float = 1.0, block: int = 512,
                       precision: str = "f32", bounded: bool = False,
                       ) -> Tuple[Array, Array, Array]:
    """-> (furthest_positive_lse [N], closest_negative_lse [N],
    neg_count [N]) with reference lifted-loss semantics, never
    materializing the N x N matrix.  Differentiable w.r.t. ``emb``.

    precision="bf16" runs the MXU matmuls on bfloat16 inputs with f32
    accumulation (distances shift by ~1e-2 relative); "f32" (default) is
    exact vs the dense path.

    bounded=True promises the caller's embeddings are L2-NORMALIZED
    (squared-euclidean distances <= 4, so exp cannot overflow) and
    dispatches the triangular no-max-tracking forward
    (ops/pallas/lifted_tri.py) — measured 1.68 ms vs 1.75 ms for the row
    forward at N=8192, d=128 (~1.05x; see docs/KERNELS.md "lifted
    roofline" for why the binding cost is reductions, not exp).
    Semantics identical; an unnormalized caller passing bounded=True
    risks inf in the plain exponential sums.
    """
    fp, cn, nc = _lifted_impl(emb, labels, valid, margin, block, precision,
                              bounded)
    return fp, cn, nc


def _prep(emb, labels, valid):
    emb = emb.astype(jnp.float32)
    labels_f = _dense_label_ids(labels)
    n = emb.shape[0]
    valid_f = (jnp.ones(n, jnp.float32) if valid is None
               else valid.reshape(-1).astype(jnp.float32))
    return emb, labels_f, valid_f


def _lifted_impl(emb, labels, valid, margin, block, precision,
                 bounded=False):
    emb, labels_f, valid_f = _prep(emb, labels, valid)
    if bounded:
        from multimodal_similarity_tpu.ops.pallas.lifted_tri import (
            lifted_fwd_tri)
        return lifted_fwd_tri(emb, labels_f, valid_f, margin, block,
                              precision)
    return _lifted_fwd_pallas(emb, labels_f, valid_f, margin, block,
                              precision)


def _lifted_fwd(emb, labels, valid, margin, block, precision, bounded):
    emb32, labels_f, valid_f = _prep(emb, labels, valid)
    fp, cn, nc = _lifted_impl(emb, labels, valid, margin, block, precision,
                              bounded)
    return (fp, cn, nc), (emb32, labels_f, valid_f, fp, cn)


def _lifted_bwd(margin, block, precision, bounded, res, grads):
    del bounded  # the recompute VJP reads saved fp/cn; fwd path-agnostic
    emb, labels_f, valid_f, fp, cn = res
    g_fp, g_cn, _ = grads
    row = _lifted_bwd_pallas(emb, labels_f, valid_f, fp, cn, g_fp, g_cn,
                             margin, block, transpose=False,
                             precision=precision)
    col = _lifted_bwd_pallas(emb, labels_f, valid_f, fp, cn, g_fp, g_cn,
                             margin, block, transpose=True,
                             precision=precision)
    return row + col, None, None


fused_lifted_stats.defvjp(_lifted_fwd, _lifted_bwd)


def lifted_loss_pallas(emb: Array, pids: Array, margin: float,
                       weighted: bool = True,
                       valid: Optional[Array] = None, block: int = 512,
                       precision: str = "f32", bounded: bool = False):
    """Lifted-structured loss via the fused kernel; same tuple as
    ops.losses.lifted_loss.  ``bounded=True`` when ``emb`` is
    l2-normalized (dispatches the faster triangular forward)."""
    pids_f = pids.reshape(-1).astype(jnp.float32)
    n = emb.shape[0]
    valid_f = (jnp.ones(n, jnp.float32) if valid is None
               else valid.reshape(-1).astype(jnp.float32))
    fp, cn, neg_count = fused_lifted_stats(emb, pids, valid, margin, block,
                                           precision, bounded)
    diff = jnp.maximum(fp + cn, 0.0)
    foreground = (pids_f != 0.0).astype(jnp.float32) * valid_f
    if weighted:
        weights = neg_count * foreground
        weights = weights / jnp.sum(weights)
    else:
        weights = valid_f / jnp.sum(valid_f)
    loss = jnp.sum(diff * weights)
    num_active = jnp.asarray(1.0, jnp.float32)
    return loss, num_active, diff, weights, fp, cn
