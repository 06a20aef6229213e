"""Fused pairwise-distance + batch-hard reduction.

Computes, per anchor row, the furthest-positive and closest-negative
squared-euclidean distances (the core of the batch-hard loss,
ops/losses.py:batch_hard / reference networks.py:797-833) in one pass of
[TM, D] x [TN, D] MXU tiles — the N x N distance matrix never exists in
HBM, so the mining batch can grow to tens of thousands of events.

The custom VJP back-propagates only through each row's winning pair
(identical to XLA's gradient of masked max/min over the dense matrix):
d|a-b|^2/da = 2(a-b) into the anchor, -2(a-b) scattered into the winner.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray
_POS_INF = 1e30


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _stats_kernel(a_ref, b_ref, la_ref, lb_ref, vb_ref,
                  fp_ref, fpi_ref, cn_ref, cni_ref, nc_ref,
                  *, block_n: int, precision: str):
    j = pl.program_id(1)
    i = pl.program_id(0)

    a = a_ref[:]                                   # [TM, D]
    b = b_ref[:]                                   # [TN, D]
    # bf16 operands + f32 accumulation by default: matches XLA's default
    # TPU matmul precision and quadruples MXU throughput vs f32 passthrough
    mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    inner = jax.lax.dot_general(a.astype(mm_dtype), b.astype(mm_dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    sq_a = jnp.sum(a * a, axis=1, keepdims=True)   # [TM, 1]
    sq_b = jnp.sum(b * b, axis=1, keepdims=True)   # [TN, 1]
    dist = jnp.maximum(sq_a + sq_b.T - 2.0 * inner, 0.0)   # [TM, TN]

    tm, tn = dist.shape
    la = la_ref[:]                                 # [TM, 1] f32 labels
    lb = lb_ref[:]                                 # [TN, 1]
    vb = vb_ref[:]                                 # [TN, 1] validity
    row_ids = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
    col_ids = j * tn + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)

    same = la == lb.T                              # [TM, TN]
    valid = vb.T > 0.0
    eye = row_ids == col_ids
    pos_m = same & ~eye & valid
    neg_m = (~same) & valid

    pos_val = dist * pos_m.astype(jnp.float32)
    tile_fp = jnp.max(pos_val, axis=1, keepdims=True)          # [TM, 1]
    tile_fpa = jnp.argmax(pos_val, axis=1).reshape(tm, 1) + j * tn
    neg_val = jnp.where(neg_m, dist, _POS_INF)
    tile_cn = jnp.min(neg_val, axis=1, keepdims=True)
    tile_cna = jnp.argmin(neg_val, axis=1).reshape(tm, 1) + j * tn
    tile_nc = jnp.sum(neg_m.astype(jnp.float32), axis=1, keepdims=True)

    @pl.when(j == 0)
    def _init():
        fp_ref[:] = tile_fp
        fpi_ref[:] = tile_fpa.astype(jnp.int32)
        cn_ref[:] = tile_cn
        cni_ref[:] = tile_cna.astype(jnp.int32)
        nc_ref[:] = tile_nc

    @pl.when(j != 0)
    def _update():
        better_fp = tile_fp > fp_ref[:]
        fp_ref[:] = jnp.where(better_fp, tile_fp, fp_ref[:])
        fpi_ref[:] = jnp.where(better_fp, tile_fpa.astype(jnp.int32),
                               fpi_ref[:])
        better_cn = tile_cn < cn_ref[:]
        cn_ref[:] = jnp.where(better_cn, tile_cn, cn_ref[:])
        cni_ref[:] = jnp.where(better_cn, tile_cna.astype(jnp.int32),
                               cni_ref[:])
        nc_ref[:] = nc_ref[:] + tile_nc


def _stats_kernel_noidx(a_ref, b_ref, la_ref, lb_ref, vb_ref,
                        fp_ref, cn_ref, nc_ref,
                        *, block_n: int, precision: str):
    """Forward-only variant: no argmax/argmin winner tracking — fewer VPU
    reduction passes for inference/eval calls where no VJP is needed."""
    j = pl.program_id(1)
    i = pl.program_id(0)

    a = a_ref[:]
    b = b_ref[:]
    mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    inner = jax.lax.dot_general(a.astype(mm_dtype), b.astype(mm_dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    sq_a = jnp.sum(a * a, axis=1, keepdims=True)
    sq_b = jnp.sum(b * b, axis=1, keepdims=True)
    dist = jnp.maximum(sq_a + sq_b.T - 2.0 * inner, 0.0)

    tm, tn = dist.shape
    la = la_ref[:]
    lb = lb_ref[:]
    vb = vb_ref[:]
    row_ids = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
    col_ids = j * tn + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
    same = la == lb.T
    valid = vb.T > 0.0
    pos_m = same & (row_ids != col_ids) & valid
    neg_m = (~same) & valid

    tile_fp = jnp.max(dist * pos_m.astype(jnp.float32), axis=1,
                      keepdims=True)
    tile_cn = jnp.min(jnp.where(neg_m, dist, _POS_INF), axis=1,
                      keepdims=True)
    tile_nc = jnp.sum(neg_m.astype(jnp.float32), axis=1, keepdims=True)

    @pl.when(j == 0)
    def _init():
        fp_ref[:] = tile_fp
        cn_ref[:] = tile_cn
        nc_ref[:] = tile_nc

    @pl.when(j != 0)
    def _update():
        fp_ref[:] = jnp.maximum(fp_ref[:], tile_fp)
        cn_ref[:] = jnp.minimum(cn_ref[:], tile_cn)
        nc_ref[:] = nc_ref[:] + tile_nc


def _stats_pallas_noidx(emb: Array, labels_f: Array, valid_f: Array,
                        block: int, precision: str = "bf16"):
    n, d = emb.shape
    pad = (-n) % block
    emb_p = jnp.pad(emb, ((0, pad), (0, 0)))
    lab_p = jnp.pad(labels_f, ((0, pad),), constant_values=-1.0)
    val_p = jnp.pad(valid_f, ((0, pad),), constant_values=0.0)
    np_ = n + pad
    grid = (np_ // block, np_ // block)
    row_spec = pl.BlockSpec((block, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_stats_kernel_noidx, block_n=block,
                          precision=precision),
        out_shape=[jax.ShapeDtypeStruct((np_, 1), jnp.float32)] * 3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * np_ * d,
            bytes_accessed=4 * (2 * np_ * d + 3 * np_),
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(emb_p, emb_p, lab_p.reshape(-1, 1), lab_p.reshape(-1, 1),
      val_p.reshape(-1, 1))
    fp, cn, nc = outs
    return fp[:n, 0], cn[:n, 0], nc[:n, 0]


def _stats_pallas(emb: Array, labels_f: Array, valid_f: Array,
                  block: int, precision: str = "bf16",
                  ) -> Tuple[Array, Array, Array, Array, Array]:
    n, d = emb.shape
    pad = (-n) % block
    emb_p = jnp.pad(emb, ((0, pad), (0, 0)))
    lab_p = jnp.pad(labels_f, ((0, pad),), constant_values=-1.0)
    val_p = jnp.pad(valid_f, ((0, pad),), constant_values=0.0)
    np_ = n + pad
    grid = (np_ // block, np_ // block)

    out_shapes = [
        jax.ShapeDtypeStruct((np_, 1), jnp.float32),   # fp
        jax.ShapeDtypeStruct((np_, 1), jnp.int32),     # fp idx
        jax.ShapeDtypeStruct((np_, 1), jnp.float32),   # cn
        jax.ShapeDtypeStruct((np_, 1), jnp.int32),     # cn idx
        jax.ShapeDtypeStruct((np_, 1), jnp.float32),   # neg count
    ]
    row_spec = pl.BlockSpec((block, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_stats_kernel, block_n=block, precision=precision),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec] * 5,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * np_ * d,
            bytes_accessed=4 * (2 * np_ * d + 5 * np_),
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(emb_p, emb_p, lab_p.reshape(-1, 1), lab_p.reshape(-1, 1),
      val_p.reshape(-1, 1))
    fp, fpi, cn, cni, nc = outs
    return (fp[:n, 0], cn[:n, 0], nc[:n, 0], fpi[:n, 0], cni[:n, 0])


# ---------------------------------------------------------------------------
# Differentiable wrapper
# ---------------------------------------------------------------------------

def _auto_block(d: int) -> int:
    """Largest tile that keeps the [TM, TN] working set well inside VMEM."""
    if d <= 128:
        return 1024
    if d <= 512:
        return 512
    return 256


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_batch_hard_stats(emb: Array, labels: Array,
                           valid: Optional[Array] = None,
                           block: int = 0, precision: str = "bf16"):
    """-> (furthest_positive [N], closest_negative [N], neg_count [N]).

    Squared-euclidean distances; labels int; ``valid`` masks padding rows
    out of the positive/negative candidate sets.  Differentiable w.r.t.
    ``emb`` through each row's winning pair only.  precision: "bf16"
    (default, matches XLA's TPU matmul default) | "f32" (exact).

    The primal (no-grad) path skips the argmax/argmin winner tracking —
    winner indices are only computed when the VJP needs them.
    """
    if not block:
        block = _auto_block(emb.shape[1])
    emb32 = emb.astype(jnp.float32)
    labels_f = labels.reshape(-1).astype(jnp.float32)
    n = emb32.shape[0]
    valid_f = (jnp.ones(n, jnp.float32) if valid is None
               else valid.reshape(-1).astype(jnp.float32))
    return _stats_pallas_noidx(emb32, labels_f, valid_f, block, precision)


def _stats_impl(emb, labels, valid, block, precision="bf16"):
    if not block:
        block = _auto_block(emb.shape[1])
    emb = emb.astype(jnp.float32)
    labels_f = labels.reshape(-1).astype(jnp.float32)
    n = emb.shape[0]
    valid_f = (jnp.ones(n, jnp.float32) if valid is None
               else valid.reshape(-1).astype(jnp.float32))
    return _stats_pallas(emb, labels_f, valid_f, block, precision)


def _stats_fwd(emb, labels, valid, block, precision):
    fp, cn, nc, fpi, cni = _stats_impl(emb, labels, valid, block, precision)
    return (fp, cn, nc), (emb.astype(jnp.float32), fp, cn, fpi, cni)


def _stats_bwd(block, precision, res, grads):
    emb, fp, cn, fpi, cni = res
    g_fp, g_cn, _ = grads
    n = emb.shape[0]

    coef_fp = g_fp * (fp > 0.0)
    diff_fp = emb - emb[fpi]
    grad = 2.0 * coef_fp[:, None] * diff_fp
    grad = grad.at[fpi].add(-2.0 * coef_fp[:, None] * diff_fp)

    coef_cn = g_cn * (cn < _POS_INF)
    diff_cn = emb - emb[cni]
    grad = grad + 2.0 * coef_cn[:, None] * diff_cn
    grad = grad.at[cni].add(-2.0 * coef_cn[:, None] * diff_cn)
    return grad, None, None


fused_batch_hard_stats.defvjp(_stats_fwd, _stats_bwd)


def batch_hard_pallas(emb: Array, pids: Array, margin="soft",
                      weighted: bool = True, valid: Optional[Array] = None,
                      block: int = 0, precision: str = "bf16"):
    """Batch-hard loss from embeddings via the fused kernel.

    Same return tuple as ops.losses.batch_hard: (loss, num_active, diff,
    weights, furthest_positive, closest_negative)."""
    pids_f = pids.reshape(-1).astype(jnp.float32)
    n = emb.shape[0]
    valid_f = (jnp.ones(n, jnp.float32) if valid is None
               else valid.reshape(-1).astype(jnp.float32))
    fp, cn, neg_count = fused_batch_hard_stats(emb, pids, valid, block,
                                               precision)

    diff = fp - cn
    if margin == "soft":
        diff = jax.nn.softplus(diff)
    else:
        diff = jnp.maximum(diff + margin, 0.0)

    foreground = (pids_f != 0.0).astype(jnp.float32) * valid_f
    foreground_num = jnp.sum(foreground)
    if weighted:
        weights = neg_count * foreground
        weights = weights / jnp.sum(weights)
    else:
        weights = valid_f / jnp.sum(valid_f)

    loss = jnp.sum(diff * weights)
    num_active = jnp.sum((diff * foreground > 1e-5).astype(jnp.float32))
    num_active = num_active / foreground_num
    return loss, num_active, diff, weights, fp, cn
