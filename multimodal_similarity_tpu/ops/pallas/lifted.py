"""Fused lifted-structured statistics: online-logsumexp over distance tiles.

Per anchor row i (reference semantics, networks.py:835-870):
  fp_i = logsumexp_j( dist_ij * pos_mask_ij )   (non-positives contribute
                                                 exp(0) — the trained
                                                 objective, kept exactly)
  cn_i = logsumexp_{j: neg} ( margin - dist_ij )

computed FlashAttention-style: each [TM, d] x [TN, d] tile issues one MXU
matmul and folds into running (max, sum-exp) accumulators — the N x N
matrix never exists in HBM.

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

Array = jnp.ndarray
_NEG_INF = -1e30


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_values(a, b, la, lb, vb, row_off, col_off, margin,
                 mm_dtype=jnp.float32):
    """dist tile + masks + the two value matrices (v_pos, v_neg)."""
    inner = jax.lax.dot_general(a.astype(mm_dtype), b.astype(mm_dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    sq_a = jnp.sum(a * a, axis=1, keepdims=True)
    sq_b = jnp.sum(b * b, axis=1, keepdims=True)
    dist = jnp.maximum(sq_a + sq_b.T - 2.0 * inner, 0.0)
    tm, tn = dist.shape
    row_ids = row_off + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
    col_ids = col_off + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
    same = la == lb.T
    valid = vb.T > 0.0
    pos_m = same & (row_ids != col_ids) & valid
    neg_m = (~same) & valid
    v_pos = jnp.where(valid, dist * pos_m.astype(jnp.float32), _NEG_INF)
    v_neg = jnp.where(neg_m, margin - dist, _NEG_INF)
    return dist, pos_m, neg_m, v_pos, v_neg


def _fwd_kernel(a_ref, b_ref, la_ref, lb_ref, vb_ref,
                fp_m_ref, fp_s_ref, cn_m_ref, cn_s_ref, nc_ref,
                *, margin: float, block: int, precision: str):
    i = pl.program_id(0)
    j = pl.program_id(1)
    mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    _, _, neg_m, v_pos, v_neg = _tile_values(
        a_ref[:], b_ref[:], la_ref[:], lb_ref[:], vb_ref[:],
        i * block, j * block, margin, mm_dtype)

    def online(m_ref, s_ref, v):
        t_max = jnp.max(v, axis=1, keepdims=True)
        t_sum = jnp.sum(jnp.exp(v - t_max), axis=1, keepdims=True)

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

    t_nc = jnp.sum(neg_m.astype(jnp.float32), axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        nc_ref[:] = t_nc

    @pl.when(j != 0)
    def _():
        nc_ref[:] = nc_ref[:] + t_nc


def _bwd_kernel(a_ref, b_ref, la_ref, lb_ref, va_ref, vb_ref,
                fp_ref, cn_ref, gfp_ref, gcn_ref, grad_ref,
                *, margin: float, block: int, transpose: bool,
                precision: str):
    """One directional pass: accumulates the row-side (or, with
    ``transpose``, the column-side) gradient contribution for the a-block.

    With transpose=True the roles swap: the grid's first axis indexes the
    COLUMN block of the conceptual matrix, and C^T is applied; fp/cn/g
    then belong to the b-block rows.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    a = a_ref[:]
    b = b_ref[:]
    mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    if not transpose:
        _, pos_m, neg_m, v_pos, v_neg = _tile_values(
            a, b, la_ref[:], lb_ref[:], vb_ref[:],
            i * block, j * block, margin, mm_dtype)
        soft_pos = jnp.exp(v_pos - fp_ref[:]) * pos_m.astype(jnp.float32)
        soft_neg = jnp.exp(v_neg - cn_ref[:]) * neg_m.astype(jnp.float32)
        c = gfp_ref[:] * soft_pos - gcn_ref[:] * soft_neg     # [TM, TN]
        rowsum = jnp.sum(c, axis=1, keepdims=True)
        contrib = 2.0 * (rowsum * a - jnp.dot(
            c.astype(mm_dtype), b.astype(mm_dtype),
            preferred_element_type=jnp.float32))
    else:
        # conceptual (k = b rows, i = a rows as columns): C_kb with fp/cn/g
        # of the b-block; accumulate 2 * (colsum * a - C^T @ E_k)
        _, pos_m, neg_m, v_pos, v_neg = _tile_values(
            b, a, lb_ref[:], la_ref[:], va_ref[:],
            j * block, i * block, margin, mm_dtype)
        soft_pos = jnp.exp(v_pos - fp_ref[:]) * pos_m.astype(jnp.float32)
        soft_neg = jnp.exp(v_neg - cn_ref[:]) * neg_m.astype(jnp.float32)
        c = gfp_ref[:] * soft_pos - gcn_ref[:] * soft_neg     # [TN(k), TM(i)]
        colsum = jnp.sum(c, axis=0)[:, None]                  # [TM, 1]
        contrib = 2.0 * (colsum * a - jnp.dot(
            c.T.astype(mm_dtype), b.astype(mm_dtype),
            preferred_element_type=jnp.float32))

    @pl.when(j == 0)
    def _():
        grad_ref[:] = contrib

    @pl.when(j != 0)
    def _():
        grad_ref[:] = grad_ref[:] + contrib


def _pad_inputs(emb, labels_f, valid_f, block):
    n, d = emb.shape
    pad = (-n) % block
    emb_p = jnp.pad(emb, ((0, pad), (0, 0)))
    lab_p = jnp.pad(labels_f, ((0, pad),), constant_values=-1.0)
    val_p = jnp.pad(valid_f, ((0, pad),), constant_values=0.0)
    return emb_p, lab_p.reshape(-1, 1), val_p.reshape(-1, 1), n + pad


def _row_spec(block):
    return pl.BlockSpec((block, 1), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)


def _lifted_fwd_pallas(emb, labels_f, valid_f, margin, block, precision):
    emb_p, lab_p, val_p, np_ = _pad_inputs(emb, labels_f, valid_f, block)
    d = emb.shape[1]
    grid = (np_ // block, np_ // block)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, margin=margin, block=block,
                          precision=precision),
        out_shape=[jax.ShapeDtypeStruct((np_, 1), jnp.float32)] * 5,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(block),
            pl.BlockSpec((block, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[_row_spec(block)] * 5,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(emb_p, emb_p, lab_p, lab_p, val_p)
    fp_m, fp_s, cn_m, cn_s, nc = outs
    n = emb.shape[0]
    fp = (fp_m + jnp.log(jnp.maximum(fp_s, 1e-30)))[:n, 0]
    cn = (cn_m + jnp.log(jnp.maximum(cn_s, 1e-30)))[:n, 0]
    return fp, cn, nc[:n, 0]


def _lifted_bwd_pallas(emb, labels_f, valid_f, fp, cn, g_fp, g_cn, margin,
                       block, transpose, precision):
    emb_p, lab_p, val_p, np_ = _pad_inputs(emb, labels_f, valid_f, block)
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
                          transpose=transpose, precision=precision),
        out_shape=jax.ShapeDtypeStruct((np_, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(block),
            pl.BlockSpec((block, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(block),
            pl.BlockSpec((block, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            stat_spec, stat_spec, stat_spec, stat_spec,
        ],
        out_specs=pl.BlockSpec((block, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_use_interpret(),
    )(emb_p, emb_p, lab_p, lab_p, val_p, val_p, fp_p, cn_p, gfp_p, gcn_p)
    return grad[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_lifted_stats(emb: Array, labels: Array,
                       valid: Optional[Array] = None,
                       margin: float = 1.0, block: int = 512,
                       precision: str = "f32",
                       ) -> Tuple[Array, Array, Array]:
    """-> (furthest_positive_lse [N], closest_negative_lse [N],
    neg_count [N]) with reference lifted-loss semantics, never
    materializing the N x N matrix.  Differentiable w.r.t. ``emb``.

    precision="bf16" runs the MXU matmuls on bfloat16 inputs with f32
    accumulation (distances shift by ~1e-2 relative); "f32" (default) is
    exact vs the dense path.
    """
    fp, cn, nc = _lifted_impl(emb, labels, valid, margin, block, precision)
    return fp, cn, nc


def _prep(emb, labels, valid):
    emb = emb.astype(jnp.float32)
    labels_f = labels.reshape(-1).astype(jnp.float32)
    n = emb.shape[0]
    valid_f = (jnp.ones(n, jnp.float32) if valid is None
               else valid.reshape(-1).astype(jnp.float32))
    return emb, labels_f, valid_f


def _lifted_impl(emb, labels, valid, margin, block, precision):
    emb, labels_f, valid_f = _prep(emb, labels, valid)
    return _lifted_fwd_pallas(emb, labels_f, valid_f, margin, block,
                              precision)


def _lifted_fwd(emb, labels, valid, margin, block, precision):
    emb32, labels_f, valid_f = _prep(emb, labels, valid)
    fp, cn, nc = _lifted_fwd_pallas(emb32, labels_f, valid_f, margin, block,
                                    precision)
    return (fp, cn, nc), (emb32, labels_f, valid_f, fp, cn)


def _lifted_bwd(margin, block, precision, res, grads):
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
                       precision: str = "f32"):
    """Lifted-structured loss via the fused kernel; same tuple as
    ops.losses.lifted_loss."""
    pids_f = pids.reshape(-1).astype(jnp.float32)
    n = emb.shape[0]
    valid_f = (jnp.ones(n, jnp.float32) if valid is None
               else valid.reshape(-1).astype(jnp.float32))
    fp, cn, neg_count = fused_lifted_stats(emb, pids, valid, margin, block,
                                           precision)
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
