"""Fused pairwise-distance + batch-hard reduction.

Computes, per anchor row, the furthest-positive and closest-negative
squared-euclidean distances (the core of the batch-hard loss,
ops/losses.py:batch_hard / reference networks.py:797-833) in one pass of
[TM, D] x [TN, D] MXU tiles — the N x N distance matrix never exists in
HBM, so the mining batch can grow to tens of thousands of events.

Performance notes (the kernel is VPU-bound at small D, MXU-bound at
D >= ~512; see bench.py's roofline output):
  * row norms are computed ONCE outside the kernel in f32 (exact) and
    streamed as [*, 1] columns — the kernel never touches ``a * a``;
  * validity is folded into the prepared inputs: invalid columns get a
    sentinel label (never equal to any real label -> excluded from the
    positive set) and a +inf-penalized norm (never win the closest-
    negative min), so the per-tile mask algebra is one label compare;
  * the self-pair exclusion compares streamed global-index columns
    (one VPU compare) instead of generating two broadcasted iotas per
    tile;
  * with precision="bf16" the operand tiles are CAST ONCE on the host
    side and streamed as bf16, halving HBM traffic and removing the
    per-tile f32->bf16 conversion (f32 accumulation on the MXU either
    way).

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
# label sentinel for invalid/padded columns: real labels are >= 0 floats
_INVALID_LABEL = -2.0


def _dense_label_ids(labels):
    """Equality-preserving float32 label ids for the kernels' tiles.

    The kernels stream labels as f32 and compare for equality; raw ids
    >= 2^24 (hashed / 64-bit track ids) would silently collide in that
    cast.  The sort-rank remap to dense 0..n-1 is exact for any feasible
    batch but costs ~0.7-0.9 ms at mining sizes — comparable to the
    kernel itself at small d — so it runs only when actually needed:
    f32 inputs pass through (the cast is the identity), and integer
    inputs take a runtime ``lax.cond`` on max|label| (a cheap reduction)
    that remaps only when some id exceeds 2^24.
    """
    lab = labels.reshape(-1)
    if lab.dtype == jnp.float32:
        return lab

    def _remap(l):
        order = jnp.argsort(l)
        slab = l[order]
        new = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               (slab[1:] != slab[:-1]).astype(jnp.int32)])
        return jnp.zeros(l.shape[0], jnp.float32).at[order].set(
            jnp.cumsum(new).astype(jnp.float32))

    if jnp.issubdtype(lab.dtype, jnp.integer):
        return jax.lax.cond(jnp.max(jnp.abs(lab)) < (1 << 24),
                            lambda l: l.astype(jnp.float32), _remap, lab)
    return _remap(lab)  # float64 etc.: distinct values may collide in f32


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_dist_and_masks(a, b, sqa, sqbp, la, lb, gi, gj):
    """Shared tile math: penalized distance + positive/negative values.

    Returns (pos_val [TM,TN]: dist on admissible positives else 0,
             neg_val [TM,TN]: dist on admissible negatives else ~+inf,
             same    [TM,TN]: admissible-positive-or-self mask).
    Invalid columns carry sqbp ~ +1e30 (excluded from neg min) and a
    sentinel label (excluded from pos max); the relu keeps them huge.
    ``gi``/``gj`` are streamed global row/col index columns — the self-pair
    exclusion is one compare per element instead of two broadcasted iotas
    (and a lax.cond over a full tile breaks Mosaic's vector-carry limits).

    When the operands arrive as bf16 the post-matmul elementwise tile math
    (distance assembly, masks, selects) ALSO runs in bf16: vregs pack
    16x128 instead of 8x128, doubling VPU throughput on the O(N^2)
    per-element work that bounds the kernel at small D.  The MXU still
    accumulates in f32; bf16's exponent range covers the 1e30 sentinels.
    """
    inner = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    cd = jnp.bfloat16 if a.dtype == jnp.bfloat16 else jnp.float32
    dist = jnp.maximum(
        sqa.astype(cd) + sqbp.astype(cd).T - 2.0 * inner.astype(cd),
        jnp.asarray(0.0, cd))
    same = la == lb.T
    pos_val = jnp.where(same & (gi != gj.T), dist, jnp.asarray(0.0, cd))
    neg_val = jnp.where(same, jnp.asarray(_POS_INF, cd), dist)
    return pos_val, neg_val, same


def _stats_kernel(a_ref, b_ref, sqa_ref, sqbp_ref, la_ref, lb_ref,
                  gi_ref, gj_ref, vb_ref,
                  fp_ref, fpi_ref, cn_ref, cni_ref, nc_ref, *, block_n: int):
    j = pl.program_id(1)
    pos_val, neg_val, same = _tile_dist_and_masks(
        a_ref[:], b_ref[:], sqa_ref[:], sqbp_ref[:], la_ref[:], lb_ref[:],
        gi_ref[:], gj_ref[:])
    tm, tn = pos_val.shape
    # Mosaic's reduce-index only lowers for f32 operands — cast before the
    # argmax/argmin (bf16 tiles otherwise crash the grad path on hardware)
    pv32 = pos_val.astype(jnp.float32)
    nv32 = neg_val.astype(jnp.float32)

    tile_fp = jnp.max(pv32, axis=1, keepdims=True)
    tile_fpa = jnp.argmax(pv32, axis=1).reshape(tm, 1) + j * tn
    tile_cn = jnp.min(nv32, axis=1, keepdims=True)
    tile_cna = jnp.argmin(nv32, axis=1).reshape(tm, 1) + j * tn
    tile_nc = jnp.sum(jnp.where(same, 0.0, vb_ref[:].T), axis=1,
                      keepdims=True)

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


def _stats_kernel_noidx(a_ref, b_ref, sqa_ref, sqbp_ref, la_ref, lb_ref,
                        gi_ref, gj_ref, vb_ref,
                        fp_ref, cn_ref, nc_ref, *, block_n: int):
    """Forward-only variant: no argmax/argmin winner tracking — fewer VPU
    reduction passes for inference/eval calls where no VJP is needed."""
    j = pl.program_id(1)
    pos_val, neg_val, same = _tile_dist_and_masks(
        a_ref[:], b_ref[:], sqa_ref[:], sqbp_ref[:], la_ref[:], lb_ref[:],
        gi_ref[:], gj_ref[:])

    tile_fp = jnp.max(pos_val, axis=1, keepdims=True).astype(jnp.float32)
    tile_cn = jnp.min(neg_val, axis=1, keepdims=True).astype(jnp.float32)
    tile_nc = jnp.sum(jnp.where(same, 0.0, vb_ref[:].T), axis=1,
                      keepdims=True)

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


def _prep_operands(emb: Array, labels_f: Array, valid_f: Array, block: int,
                   precision: str):
    """Pad to the block size and pre-fold validity into the streamed
    inputs (see module docstring).  Returns
    (opd, sq, sq_pen, lab_eff, val, n_padded)."""
    n, d = emb.shape
    pad = (-n) % block
    emb_p = jnp.pad(emb, ((0, pad), (0, 0)))
    lab_p = jnp.pad(labels_f, ((0, pad),), constant_values=_INVALID_LABEL)
    val_p = jnp.pad(valid_f, ((0, pad),), constant_values=0.0)
    invalid = val_p <= 0.0
    # column-side labels get the sentinel so invalid columns never join the
    # positive set; ROW labels stay real — invalid rows still produce the
    # same (downstream-masked) stats as the dense oracle
    lab_eff = jnp.where(invalid, _INVALID_LABEL, lab_p)
    sq = jnp.sum(emb_p * emb_p, axis=1, keepdims=True)        # exact f32
    sq_pen = jnp.where(invalid[:, None], _POS_INF, sq)
    opd = emb_p.astype(jnp.bfloat16) if precision == "bf16" else emb_p
    gidx = jnp.arange(n + pad, dtype=jnp.float32).reshape(-1, 1)
    return (opd, sq, sq_pen, lab_p.reshape(-1, 1),
            lab_eff.reshape(-1, 1), gidx, val_p.reshape(-1, 1), n + pad)


def _col_spec(block, ix):
    return pl.BlockSpec((block, 1), ix, memory_space=pltpu.VMEM)


def _stats_in_specs(block, d):
    row_ix = lambda i, j: (i, 0)   # noqa: E731
    col_ix = lambda i, j: (j, 0)   # noqa: E731
    return [
        pl.BlockSpec((block, d), row_ix, memory_space=pltpu.VMEM),  # a
        pl.BlockSpec((block, d), col_ix, memory_space=pltpu.VMEM),  # b
        _col_spec(block, row_ix),                                   # sq_a
        _col_spec(block, col_ix),                                   # sq_b pen
        _col_spec(block, row_ix),                                   # la
        _col_spec(block, col_ix),                                   # lb
        _col_spec(block, row_ix),                                   # gi
        _col_spec(block, col_ix),                                   # gj
        _col_spec(block, col_ix),                                   # vb
    ]


def _stats_pallas_noidx(emb: Array, labels_f: Array, valid_f: Array,
                        block: int, precision: str = "bf16"):
    n, d = emb.shape
    opd, sq, sq_pen, lab, lab_eff, gidx, val, np_ = _prep_operands(
        emb, labels_f, valid_f, block, precision)
    grid = (np_ // block, np_ // block)
    row_spec = _col_spec(block, lambda i, j: (i, 0))
    esize = 2 if precision == "bf16" else 4
    outs = pl.pallas_call(
        functools.partial(_stats_kernel_noidx, block_n=block),
        out_shape=[jax.ShapeDtypeStruct((np_, 1), jnp.float32)] * 3,
        grid=grid,
        in_specs=_stats_in_specs(block, d),
        out_specs=[row_spec] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * np_ * d,
            bytes_accessed=esize * 2 * np_ * d + 4 * 6 * np_,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(opd, opd, sq, sq_pen, lab, lab_eff, gidx, gidx, val)
    fp, cn, nc = outs
    return fp[:n, 0], cn[:n, 0], nc[:n, 0]


def _stats_pallas(emb: Array, labels_f: Array, valid_f: Array,
                  block: int, precision: str = "bf16",
                  ) -> Tuple[Array, Array, Array, Array, Array]:
    n, d = emb.shape
    opd, sq, sq_pen, lab, lab_eff, gidx, val, np_ = _prep_operands(
        emb, labels_f, valid_f, block, precision)
    grid = (np_ // block, np_ // block)

    out_shapes = [
        jax.ShapeDtypeStruct((np_, 1), jnp.float32),   # fp
        jax.ShapeDtypeStruct((np_, 1), jnp.int32),     # fp idx
        jax.ShapeDtypeStruct((np_, 1), jnp.float32),   # cn
        jax.ShapeDtypeStruct((np_, 1), jnp.int32),     # cn idx
        jax.ShapeDtypeStruct((np_, 1), jnp.float32),   # neg count
    ]
    row_spec = _col_spec(block, lambda i, j: (i, 0))
    esize = 2 if precision == "bf16" else 4
    outs = pl.pallas_call(
        functools.partial(_stats_kernel, block_n=block),
        out_shape=out_shapes,
        grid=grid,
        in_specs=_stats_in_specs(block, d),
        out_specs=[row_spec] * 5,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * np_ * d,
            bytes_accessed=esize * 2 * np_ * d + 4 * 8 * np_,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(opd, opd, sq, sq_pen, lab, lab_eff, gidx, gidx, val)
    fp, fpi, cn, cni, nc = outs
    return (fp[:n, 0], cn[:n, 0], nc[:n, 0], fpi[:n, 0], cni[:n, 0])


# ---------------------------------------------------------------------------
# Differentiable wrapper
# ---------------------------------------------------------------------------

def _auto_block(d: int, precision: str = "bf16") -> int:
    """Largest tile that keeps the [TM, TN] working set well inside VMEM.

    Measured on v5e (BENCH methodology, chained dispatch): at d=1024 a
    1024-tile runs the kernel at 49%/75% MFU (N=8192/16384) vs 29%/55%
    with a 512-tile — the bigger operand tile amortizes per-grid-step
    overhead and MXU weight loads.  bf16 operands at block=1024, d=1024:
    2 x 2 MB tiles double-buffered + a 2 MB elementwise tile ~ 10 MB,
    inside the 16 MB VMEM budget; f32 doubles that, so it stays at 512.
    """
    if precision != "bf16":
        return 1024 if d <= 128 else 512
    return 1024 if d <= 1024 else 512


def _use_triangular(n: int, d: int, block: int, algo: str) -> bool:
    """auto -> triangular only where the kernel is MXU-bound.

    The triangular pass halves the MXU contraction work but NOT the VPU
    reduction work (each off-diagonal tile is reduced along both axes),
    and adds accumulator read-modify-writes.  Measured on v5e (bf16,
    auto blocks): d=128 tri is 0.80x row, d=256 0.88x — VPU-bound, row
    wins; d=1024 tri is 1.09x (N=8192) / 1.19x (N=16384) — MXU-bound,
    tri wins.  Crossover sits between d=256 and d=1024; gate at 512.
    Also needs >= 4 tiles for the halved work to outweigh the RMWs.
    """
    if algo == "tri":
        return True
    if algo == "row":
        return False
    n_tiles = -(-n // block)
    return d >= 512 and n_tiles >= 4


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_batch_hard_stats(emb: Array, labels: Array,
                           valid: Optional[Array] = None,
                           block: int = 0, precision: str = "bf16",
                           algo: str = "auto"):
    """-> (furthest_positive [N], closest_negative [N], neg_count [N]).

    Squared-euclidean distances; labels int; ``valid`` masks padding rows
    out of the positive/negative candidate sets.  Differentiable w.r.t.
    ``emb`` through each row's winning pair only.  precision: "bf16"
    (default, matches XLA's TPU matmul default) | "f32" (exact).
    algo: "auto" | "row" (full-matrix tile stream) | "tri" (triangular —
    half the MXU work; see batch_hard_tri.py).

    The primal (no-grad) path skips the argmax/argmin winner tracking —
    winner indices are only computed when the VJP needs them.
    """
    if not block:
        block = _auto_block(emb.shape[1], precision)
    emb32 = emb.astype(jnp.float32)
    labels_f = _dense_label_ids(labels)
    n = emb32.shape[0]
    valid_f = (jnp.ones(n, jnp.float32) if valid is None
               else valid.reshape(-1).astype(jnp.float32))
    if _use_triangular(n, emb.shape[1], block, algo):
        from multimodal_similarity_tpu.ops.pallas.batch_hard_tri import (
            _stats_tri)
        return _stats_tri(emb32, labels_f, valid_f, block, precision,
                          with_idx=False)
    return _stats_pallas_noidx(emb32, labels_f, valid_f, block, precision)


def _stats_impl(emb, labels, valid, block, precision="bf16", algo="auto"):
    if not block:
        block = _auto_block(emb.shape[1], precision)
    emb = emb.astype(jnp.float32)
    labels_f = _dense_label_ids(labels)
    n = emb.shape[0]
    valid_f = (jnp.ones(n, jnp.float32) if valid is None
               else valid.reshape(-1).astype(jnp.float32))
    if _use_triangular(n, emb.shape[1], block, algo):
        from multimodal_similarity_tpu.ops.pallas.batch_hard_tri import (
            _stats_tri)
        return _stats_tri(emb, labels_f, valid_f, block, precision,
                          with_idx=True)
    return _stats_pallas(emb, labels_f, valid_f, block, precision)


def _stats_fwd(emb, labels, valid, block, precision, algo):
    fp, cn, nc, fpi, cni = _stats_impl(emb, labels, valid, block,
                                       precision, algo)
    return (fp, cn, nc), (emb.astype(jnp.float32), fp, cn, fpi, cni)


def winning_pair_grad(emb, fp, cn, fpi, cni, g_fp, g_cn):
    """Gradient of per-row (furthest-positive, closest-negative) stats
    w.r.t. the embeddings, routed through each row's winning pair only —
    exactly XLA's gradient of the masked max/min.  Shared by the fused
    kernels' VJP and the ring pass (parallel/ring_mining.py)."""
    coef_fp = g_fp * (fp > 0.0)
    diff_fp = emb - emb[fpi]
    grad = 2.0 * coef_fp[:, None] * diff_fp
    grad = grad.at[fpi].add(-2.0 * coef_fp[:, None] * diff_fp)

    # 0.5x threshold: in bf16 mode the 1e30 no-negative sentinel rounds,
    # so an exact compare could leak gradient into an arbitrary "winner"
    coef_cn = g_cn * (cn < 0.5 * _POS_INF)
    diff_cn = emb - emb[cni]
    grad = grad + 2.0 * coef_cn[:, None] * diff_cn
    grad = grad.at[cni].add(-2.0 * coef_cn[:, None] * diff_cn)
    return grad


def _stats_bwd(block, precision, algo, res, grads):
    emb, fp, cn, fpi, cni = res
    g_fp, g_cn, _ = grads
    return winning_pair_grad(emb, fp, cn, fpi, cni, g_fp, g_cn), None, None


fused_batch_hard_stats.defvjp(_stats_fwd, _stats_bwd)


def batch_hard_pallas(emb: Array, pids: Array, margin="soft",
                      weighted: bool = True, valid: Optional[Array] = None,
                      block: int = 0, precision: str = "bf16",
                      algo: str = "auto"):
    """Batch-hard loss from embeddings via the fused kernel.

    Same return tuple as ops.losses.batch_hard: (loss, num_active, diff,
    weights, furthest_positive, closest_negative)."""
    pids_f = pids.reshape(-1).astype(jnp.float32)
    n = emb.shape[0]
    valid_f = (jnp.ones(n, jnp.float32) if valid is None
               else valid.reshape(-1).astype(jnp.float32))
    fp, cn, neg_count = fused_batch_hard_stats(emb, pids, valid, block,
                                               precision, algo)

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
