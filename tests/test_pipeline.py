"""Pipeline-parallel backbone tests (parallel/pipeline.py).

Fast tests drive the stage machinery with a small unit-segmented stub
trunk; the slow test runs the real InceptionResNetV2 trunk stage-split
over the 8 virtual CPU devices and pins output parity with the
single-device forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from multimodal_similarity_tpu.parallel.pipeline import (
    PipelinedBackbone, profile_unit_costs, split_units_balanced)

N_STUB_UNITS = 6


class StubTrunk(nn.Module):
    """Minimal unit-segmented trunk following the pipeline protocol:
    6 units = a strided stem conv, 4 named residual blocks, a head."""

    width: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False, unit_lo: int = 0,
                 unit_hi: int = N_STUB_UNITS):
        def stem(h):
            h = nn.Conv(self.width, (3, 3), strides=(2, 2), use_bias=False,
                        name="stem")(h)
            h = nn.BatchNorm(use_running_average=not train, use_scale=False,
                             name="stem_BatchNorm")(h)
            return nn.relu(h)

        def block(i):
            def f(h):
                up = nn.Conv(self.width, (3, 3), name=f"block_{i}")(h)
                return nn.relu(h + 0.2 * up)
            return f

        def head(h):
            return nn.Conv(2 * self.width, (1, 1), name="head")(h)

        units = [stem] + [block(i) for i in range(4)] + [head]
        h = x
        for fn in units[unit_lo:unit_hi]:
            h = fn(h)
        return h


@pytest.fixture(scope="module")
def stub():
    model = StubTrunk()
    x = jnp.asarray(np.random.RandomState(0).randn(4, 16, 16, 3)
                    .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_split_units_balanced_minimizes_max_stage():
    # heavily skewed costs: the balanced split isolates the heavy unit
    bounds = split_units_balanced([1, 1, 1, 10, 1, 1], 3)
    assert bounds == [(0, 3), (3, 4), (4, 6)]
    # uniform costs fall back to (near-)equal unit counts, full tiling
    bounds = split_units_balanced([1.0] * 7, 3)
    assert bounds[0][0] == 0 and bounds[-1][1] == 7
    assert all(a[1] == b[0] for a, b in zip(bounds, bounds[1:]))
    assert max(hi - lo for lo, hi in bounds) <= 3
    with pytest.raises(ValueError):
        split_units_balanced([1.0] * 3, 4)


def test_pipeline_matches_single_device_forward(stub):
    model, variables, x = stub
    ref = model.apply(variables, x)
    pipe = PipelinedBackbone(model, variables, n_units=N_STUB_UNITS,
                             input_shape=x.shape[1:], n_stages=3,
                             microbatch=2)
    assert len(pipe.stage_ranges) == 3
    out = pipe(np.asarray(x))
    np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_pipeline_partitions_variables_disjointly(stub):
    model, variables, x = stub
    pipe = PipelinedBackbone(model, variables, n_units=N_STUB_UNITS,
                             input_shape=x.shape[1:], n_stages=3,
                             microbatch=2)
    # stages together hold the full tree exactly once, on their devices
    for coll in variables:
        seen = []
        for sv in pipe.stage_vars:
            seen.extend(sv.get(coll, {}))
        assert sorted(seen) == sorted(variables[coll])
    assert [d for d in pipe.devices] == jax.devices()[:3]
    for s, sv in enumerate(pipe.stage_vars):
        for leaf in jax.tree_util.tree_leaves(sv):
            assert leaf.devices() == {pipe.devices[s]}
    counts = pipe.stage_parameter_counts()
    assert sum(counts) == sum(
        int(np.prod(v.shape))
        for v in jax.tree_util.tree_leaves(variables))


def test_pipeline_microbatch_remainder_and_empty(stub):
    model, variables, x = stub
    pipe = PipelinedBackbone(model, variables, n_units=N_STUB_UNITS,
                             input_shape=x.shape[1:], n_stages=2,
                             microbatch=3)
    # B=4 with microbatch 3: remainder microbatch is padded then trimmed
    ref = model.apply(variables, x)
    out = pipe(np.asarray(x))
    assert out.shape[0] == 4
    np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-6, atol=1e-6)
    empty = pipe(np.zeros((0, 16, 16, 3), np.float32))
    assert empty.shape == (0,) + ref.shape[1:]


def test_pipeline_rejects_more_stages_than_devices(stub):
    model, variables, x = stub
    with pytest.raises(ValueError, match="are visible"):
        PipelinedBackbone(model, variables, n_units=N_STUB_UNITS,
                          input_shape=x.shape[1:],
                          n_stages=len(jax.devices()) + 1)


def test_pipeline_rejects_bad_ranges_and_costs(stub):
    model, variables, x = stub
    with pytest.raises(ValueError, match="do not tile"):
        PipelinedBackbone(model, variables, n_units=N_STUB_UNITS,
                          input_shape=x.shape[1:], n_stages=2,
                          stage_ranges=[(0, 2), (3, N_STUB_UNITS)])
    with pytest.raises(ValueError, match="unit_costs"):
        PipelinedBackbone(model, variables, n_units=N_STUB_UNITS,
                          input_shape=x.shape[1:], n_stages=2,
                          unit_costs=[1.0] * 3)


def test_profile_unit_costs_orders_heavy_units(stub):
    model, variables, x = stub
    costs = profile_unit_costs(model, N_STUB_UNITS, x.shape[1:],
                               microbatch=1)
    assert len(costs) == N_STUB_UNITS and all(c >= 0 for c in costs)
    # the 3x3 residual blocks at full width cost more than the 1x1 head
    assert costs[1] > costs[5]


def test_pipeline_cotenancy_with_dp_training(stub):
    """The pipeline's stated deployment case (docs/SCALING.md "pp"):
    extraction stage-split over devices the training mesh does NOT own,
    both running interleaved with no interference — extraction output
    stays parity-exact and training still updates/converges on its own
    submesh."""
    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.parallel import (
        create_mesh, make_dp_triplet_step, replicate, shard_batch)
    from multimodal_similarity_tpu.train.state import (
        TrainState, build_optimizer)
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, variables, x = stub
    ref = np.asarray(model.apply(variables, x))
    devs = jax.devices()
    assert len(devs) >= 8, "conftest provisions 8 virtual devices"
    # training owns devices 0-3; the extraction pipeline gets 4-7
    mesh = create_mesh(4)
    pipe = PipelinedBackbone(model, variables, n_units=N_STUB_UNITS,
                             input_shape=x.shape[1:], devices=devs[4:8],
                             microbatch=2)
    for sv in pipe.stage_vars:
        for leaf in jax.tree_util.tree_leaves(sv):
            assert leaf.devices().isdisjoint(set(devs[:4]))

    rng = np.random.RandomState(0)
    n = 16
    feats = rng.randn(n, 3, 2, 2, 8).astype(np.float32)
    labels = rng.randint(0, 4, size=n).astype(np.int32)
    enc = build_encoder("convrtsn", num_seg=3, emb_dim=8, n_input=8,
                        n_h=2, n_w=2, n_C=4, keep_prob=0.9)
    state = jax.device_put(
        TrainState.create(
            enc.init(jax.random.PRNGKey(0),
                     jnp.asarray(feats[:2]))["params"],
            build_optimizer("ADAM", 0.01)),
        NamedSharding(mesh, P()))
    step = make_dp_triplet_step(enc, mesh, triplet_per_batch=8)
    batch = shard_batch({"events": jnp.asarray(feats)}, mesh)
    lab_r, mask_r, key_r, lr_r = replicate(
        (jnp.asarray(labels), jnp.ones(n, jnp.float32),
         jax.random.PRNGKey(1), jnp.float32(0.01)), mesh)

    # interleave: a train step dispatched between every extraction call
    outs = []
    for i in range(3):
        state, aux = step(state, batch["events"], lab_r, mask_r,
                          key_r, lr_r)
        outs.append(pipe(np.asarray(x)))
    assert int(state.step) == 3
    assert np.isfinite(float(aux["loss"]))
    for out in outs:
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_pipeline_cotenancy_on_shared_devices(stub):
    """The stronger co-tenancy claim (RESULTS.md: 'extraction shares
    chips with training at 1/S footprint', VERDICT r4 directive #8): the
    training mesh owns ALL devices and the extraction pipeline's stages
    sit on four of the SAME devices.  Interleaved dispatch on shared
    chips must leave both correct — extraction parity-exact against the
    whole-tower forward, training stepping/finite — because each program
    owns its own buffers and the runtime serializes per-device work."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.parallel import (
        create_mesh, make_dp_triplet_step, replicate, shard_batch)
    from multimodal_similarity_tpu.train.state import (
        TrainState, build_optimizer)

    model, variables, x = stub
    ref = np.asarray(model.apply(variables, x))
    devs = jax.devices()
    assert len(devs) >= 8, "conftest provisions 8 virtual devices"
    # training data-parallel over ALL 8 devices; the pipeline overlaps
    # devices 0-3 (a true shared-chip tenancy, unlike the disjoint split
    # above)
    mesh = create_mesh(8)
    pipe = PipelinedBackbone(model, variables, n_units=N_STUB_UNITS,
                             input_shape=x.shape[1:], devices=devs[:4],
                             microbatch=2)
    overlap = {d for sv in pipe.stage_vars
               for leaf in jax.tree_util.tree_leaves(sv)
               for d in leaf.devices()}
    assert overlap & set(devs[:4]), "pipeline must share training devices"

    rng = np.random.RandomState(0)
    n = 16
    feats = rng.randn(n, 3, 2, 2, 8).astype(np.float32)
    labels = rng.randint(0, 4, size=n).astype(np.int32)
    enc = build_encoder("convrtsn", num_seg=3, emb_dim=8, n_input=8,
                        n_h=2, n_w=2, n_C=4, keep_prob=0.9)
    state = jax.device_put(
        TrainState.create(
            enc.init(jax.random.PRNGKey(0),
                     jnp.asarray(feats[:2]))["params"],
            build_optimizer("ADAM", 0.01)),
        NamedSharding(mesh, P()))
    step = make_dp_triplet_step(enc, mesh, triplet_per_batch=8)
    batch = shard_batch({"events": jnp.asarray(feats)}, mesh)
    lab_r, mask_r, key_r, lr_r = replicate(
        (jnp.asarray(labels), jnp.ones(n, jnp.float32),
         jax.random.PRNGKey(1), jnp.float32(0.01)), mesh)

    # tighter interleave than the disjoint case: dispatch the train step
    # and the extraction BEFORE synchronizing either, so both workloads
    # are genuinely in flight on the shared devices at once
    losses, outs = [], []
    for i in range(3):
        state, aux = step(state, batch["events"], lab_r, mask_r,
                          key_r, lr_r)
        out = pipe(np.asarray(x))      # syncs extraction
        losses.append(aux["loss"])     # train result read AFTER
        outs.append(out)
    assert int(state.step) == 3
    assert all(np.isfinite(float(l)) for l in losses)
    for out in outs:
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_real_tower_pipeline_parity():
    """InceptionResNetV2 stage-split over 4 devices == single-device
    forward (small input keeps the CPU run tractable; the unit split is
    input-size-independent)."""
    from multimodal_similarity_tpu.models.inception_resnet_v2 import (
        N_PIPELINE_UNITS, InceptionResNetV2)
    from multimodal_similarity_tpu.parallel.pipeline import (
        INCEPTION_RESNET_V2_UNIT_COSTS)

    model = InceptionResNetV2()
    x = jnp.asarray(np.random.RandomState(1).randn(4, 96, 96, 3)
                    .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x)
    pipe = PipelinedBackbone(
        model, variables, n_units=N_PIPELINE_UNITS,
        input_shape=x.shape[1:], n_stages=4, microbatch=2,
        unit_costs=INCEPTION_RESNET_V2_UNIT_COSTS)
    out = pipe(np.asarray(x))
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-5, atol=2e-5)
    # the FLOP-balanced split concentrates units, not params: all four
    # stages carry a nontrivial share of the tower
    counts = pipe.stage_parameter_counts()
    assert min(counts) > 0 and len(counts) == 4
