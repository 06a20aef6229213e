"""Tiled pairwise squared-euclidean distance kernel.

The Gram expansion |a|^2 + |b|^2 - 2 a.b computed tile-by-tile: each grid
cell loads one [TM, D] row tile and one [TN, D] column tile into VMEM and
issues a single MXU matmul.  Used directly for moderate N and as the
building block of the fused reduction kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sqdist_kernel(a_ref, b_ref, out_ref):
    a = a_ref[:]
    b = b_ref[:]
    inner = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    sq_a = jnp.sum(a * a, axis=1, keepdims=True)
    sq_b = jnp.sum(b * b, axis=1, keepdims=True)
    out_ref[:] = jnp.maximum(sq_a + sq_b.T - 2.0 * inner, 0.0)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def pallas_sqdist(a: jnp.ndarray, b: jnp.ndarray, block_m: int = 256,
                  block_n: int = 256) -> jnp.ndarray:
    """[N, D] x [M, D] -> [N, M] squared euclidean distances."""
    n, d = a.shape
    m = b.shape[0]
    pad_n = (-n) % block_m
    pad_m = (-m) % block_n
    a_p = jnp.pad(a.astype(jnp.float32), ((0, pad_n), (0, 0)))
    b_p = jnp.pad(b.astype(jnp.float32), ((0, pad_m), (0, 0)))

    grid = (a_p.shape[0] // block_m, b_p.shape[0] // block_n)
    out = pl.pallas_call(
        _sqdist_kernel,
        out_shape=jax.ShapeDtypeStruct((a_p.shape[0], b_p.shape[0]),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * d + 4 * n * m,
            bytes_accessed=4 * (n * d + m * d + n * m),
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(a_p, b_p)
    return out[:n, :m]
