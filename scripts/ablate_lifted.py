"""Lifted-kernel roofline ablation at a chosen shape (docs/KERNELS.md).

Compiles ablated twins of the lifted Pallas kernels — identical tile
walk, every ``jnp.exp`` replaced by a multiply+add — and times them
against the real kernels and the bare same-shape XLA GEMM.  Round 3 ran
this at N=8192/d=128 (VPU-bound regime: exp was ~3%% of runtime); the
round-4 row at N=16384/d=1024 checks the same conclusion where the MXU
dominates.

Run on the chip:  python scripts/ablate_lifted.py [N] [D]
"""

import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_ablated(module_name: str, path: str):
    """exec a copy of the kernel module with jnp.exp -> multiply+add
    (same element count of VPU work, no transcendental)."""
    src = open(path).read()
    src = src.replace("jnp.exp(", "(lambda _x: _x * 1.0009765625 + 1.0)(")
    mod = types.ModuleType(module_name)
    mod.__file__ = path + ":ablated"
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    return mod


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    block = 512

    from multimodal_similarity_tpu.ops.pallas import lifted as real_lifted
    from multimodal_similarity_tpu.ops.pallas import (
        lifted_tri as real_tri)
    abl_lifted = _load_ablated("lifted_ablated", real_lifted.__file__)
    abl_tri = _load_ablated("lifted_tri_ablated", real_tri.__file__)

    emb = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    lab = jnp.asarray(np.random.RandomState(1).randint(0, 8, size=n))

    CHAIN = 10

    def timed(fn):
        def chained(e):
            def body(c, _):
                return fn(e + c * 1e-20), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=CHAIN)
            return out
        jfn = jax.jit(chained)
        float(jfn(emb))  # compile + sync
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            r = None
            for _ in range(3):
                r = jfn(emb)
            float(r)
            best = min(best, (time.time() - t0) / (3 * CHAIN))
        return best * 1000.0  # ms/call

    rows = []
    rows.append(("row kernel (jnp.exp)", timed(
        lambda e: real_lifted.lifted_loss_pallas(
            e, lab, 0.5, True, block=block)[0])))
    rows.append(("row kernel, exp -> mul+add", timed(
        lambda e: abl_lifted.lifted_loss_pallas(
            e, lab, 0.5, True, block=block)[0])))
    rows.append(("tri kernel bounded (jnp.exp)", timed(
        lambda e: real_lifted.lifted_loss_pallas(
            e, lab, 0.5, True, block=block, bounded=True)[0])))
    # the bounded path imports lifted_tri by name inside the dispatch, so
    # the ablated twin must be visible under that name while it traces
    tri_name = "multimodal_similarity_tpu.ops.pallas.lifted_tri"
    saved = sys.modules[tri_name]
    sys.modules[tri_name] = abl_tri
    try:
        rows.append(("tri kernel bounded, exp -> mul+add", timed(
            lambda e: abl_lifted.lifted_loss_pallas(
                e, lab, 0.5, True, block=block, bounded=True)[0])))
    finally:
        sys.modules[tri_name] = saved

    e16 = emb.astype(jnp.bfloat16)

    def gemm(e):
        return jax.lax.dot_general(e, e, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32).max()

    def timed_gemm():
        def chained(e):
            def body(c, _):
                return gemm(e + (c * 1e-20).astype(e.dtype)), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=CHAIN)
            return out
        jfn = jax.jit(chained)
        float(jfn(e16))
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            r = None
            for _ in range(3):
                r = jfn(e16)
            float(r)
            best = min(best, (time.time() - t0) / (3 * CHAIN))
        return best * 1000.0

    rows.append(("bare XLA GEMM, same shape (bf16)", timed_gemm()))

    gflop = 2 * n * n * d / 1e9
    print(f"\nLifted roofline ablation  N={n} d={d} block={block} "
          f"(backend {jax.default_backend()})")
    for name, ms in rows:
        print(f"  {name:42s} {ms:8.3f} ms  "
              f"{gflop / ms:8.1f} GFLOP/s-equivalent")
if __name__ == "__main__":
    main()
