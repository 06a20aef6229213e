"""Hardware-only Mosaic-lowering checks for the fused kernels.

The regular suite runs the Pallas kernels in interpret mode on CPU,
which validates semantics but NOT lowering: Mosaic restrictions (e.g.
reduce-index only lowering for f32 operands, tpu.transpose failing to
legalize) only surface when compiling for a real TPU — two such crashes
shipped undetected until an on-device review pass caught them.  These
tests skip everywhere except a real TPU backend and compile + run every
kernel gradient path there.

Run on hardware with:  JAX_PLATFORMS=<tpu backend> pytest tests/test_hw_kernels.py
(on this repo's tunnel setup the default environment already selects the
TPU; the CPU-forcing conftest fixture is overridden below).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Mosaic lowering checks need a real TPU backend")


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_batch_hard_grads_lower_on_tpu(rng):
    """Every (algo, precision) gradient path must compile and match the
    dense oracle on the chip."""
    from multimodal_similarity_tpu.ops.distances import self_distance
    from multimodal_similarity_tpu.ops.losses import batch_hard
    from multimodal_similarity_tpu.ops.pallas import batch_hard_pallas

    emb = jnp.asarray(rng.randn(1024, 512).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, 8, 1024))

    g_dense = jax.grad(lambda e: batch_hard(
        self_distance(e), lab.astype(jnp.float32), "soft", True)[0])(emb)
    for algo in ("row", "tri"):
        for prec in ("f32", "bf16"):
            g = jax.grad(lambda e: batch_hard_pallas(
                e, lab, "soft", True, block=512, precision=prec,
                algo=algo)[0])(emb)
            assert np.isfinite(np.asarray(g)).all(), (algo, prec)
            if prec == "f32":
                # XLA's dense oracle runs bf16 matmuls by default on TPU,
                # so its distances carry ~1e-4 noise the exact-f32-norm
                # kernel does not — compare at hardware tolerance
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(g_dense), rtol=2e-2,
                    atol=5e-4, err_msg=f"{algo}/{prec}")


def test_lifted_grads_lower_on_tpu(rng):
    from multimodal_similarity_tpu.ops.distances import self_distance
    from multimodal_similarity_tpu.ops.losses import lifted_loss
    from multimodal_similarity_tpu.ops.pallas.lifted import (
        lifted_loss_pallas)

    emb = jnp.asarray(rng.randn(1024, 64).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, 8, 1024))
    g_dense = jax.grad(lambda e: lifted_loss(
        self_distance(e), lab.astype(jnp.float32), 0.5, True)[0])(emb)
    for prec in ("f32", "bf16"):
        g = jax.grad(lambda e: lifted_loss_pallas(
            e, lab, 0.5, True, block=512, precision=prec)[0])(emb)
        assert np.isfinite(np.asarray(g)).all(), prec
        if prec == "f32":
            np.testing.assert_allclose(np.asarray(g), np.asarray(g_dense),
                                       rtol=2e-2, atol=5e-4)


def test_forward_stats_row_tri_identical_on_tpu(rng):
    from multimodal_similarity_tpu.ops.pallas import fused_batch_hard_stats

    emb = jnp.asarray(rng.randn(2048, 512).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, 8, 2048))
    r = fused_batch_hard_stats(emb, lab, None, 0, "f32", "row")
    t = fused_batch_hard_stats(emb, lab, None, 0, "f32", "tri")
    for a, b, name in zip(r, t, ("fp", "cn", "nc")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_lifted_tri_bounded_lowers_on_tpu(rng):
    """The triangular bounded lifted forward (round 3) must compile under
    Mosaic and agree with the row kernel on the chip, both precisions."""
    from multimodal_similarity_tpu.ops.pallas.lifted import (
        fused_lifted_stats, lifted_loss_pallas)

    emb = jnp.asarray(rng.randn(1024, 64).astype(np.float32))
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    lab = jnp.asarray(rng.randint(0, 8, 1024))

    fp_r, cn_r, nc_r = fused_lifted_stats(emb, lab, None, 0.5, 512,
                                          "f32", False)
    fp_t, cn_t, nc_t = fused_lifted_stats(emb, lab, None, 0.5, 512,
                                          "f32", True)
    # tri sums exponentials unshifted and in a different tile order than
    # the row kernel's max-shifted online merge: agreement is at fp
    # reassociation level (measured max rel diff ~2e-5 on chip)
    np.testing.assert_allclose(np.asarray(fp_t), np.asarray(fp_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cn_t), np.asarray(cn_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(nc_t), np.asarray(nc_r))

    for prec in ("f32", "bf16"):
        g = jax.grad(lambda e: lifted_loss_pallas(
            e, lab, 0.5, True, block=512, precision=prec,
            bounded=True)[0])(emb)
        assert np.isfinite(np.asarray(g)).all(), prec
