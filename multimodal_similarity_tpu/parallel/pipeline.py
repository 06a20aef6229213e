"""Pipeline-parallel backbone inference over a heterogeneous trunk.

The reference extracts per-frame InceptionResNetV2 features offline on a
single GPU (reference preprocess/feat_extract_ResNetV2.py:10-72); the
rebuild already runs that tower on one chip
(preprocess/features.py:flax_backbone).  This module adds the pipeline
form: split the trunk's sequential units
(models/inception_resnet_v2.py:_units) into contiguous stages, give each
stage's parameters their own device, and stream microbatches through
per-stage jitted programs.  Each device holds only its stage's params
(~1/S of the tower) and the in-flight microbatch activations, so a tower
that exceeds one chip's HBM — or shares a chip with a training job —
still extracts at full rate.

Why one XLA program per stage instead of a shard_map GPipe loop: the
in-program form needs homogeneous stages (per-stage params stacked along
a leading axis and scanned); this trunk's stages are structurally
heterogeneous (VALID-padded stem, three distinct residual families, two
reduction Mixed blocks), so the TPU-native shape is one program per
stage, compiled for and resident on its chip, with activations handed
device-to-device (ICI transfers on a pod slice — the widest boundary,
17x17x1088 at 299 input, is ~1.2 MB per microbatch of 8 in bf16) and
microbatches overlapped by JAX async dispatch: while stage s computes
microbatch m, stage s-1 is already computing microbatch m+1.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def split_units_balanced(costs: Sequence[float],
                         n_stages: int) -> List[Tuple[int, int]]:
    """Contiguous partition of units into ``n_stages`` ranges minimizing
    the maximum per-stage cost (the pipeline's steady-state step time is
    its slowest stage).  Classic linear-partition DP — n_units is ~44,
    so O(n^2 * stages) is trivial."""
    n = len(costs)
    if not 1 <= n_stages <= n:
        raise ValueError(f"need 1 <= n_stages <= {n}, got {n_stages}")
    prefix = np.concatenate([[0.0], np.cumsum(np.asarray(costs, float))])
    # dp[s][i] = best max-stage-cost splitting units[:i] into s stages
    dp = np.full((n_stages + 1, n + 1), np.inf)
    cut = np.zeros((n_stages + 1, n + 1), np.int64)
    dp[0][0] = 0.0
    for s in range(1, n_stages + 1):
        for i in range(s, n + 1):
            for j in range(s - 1, i):
                c = max(dp[s - 1][j], prefix[i] - prefix[j])
                if c < dp[s][i]:
                    dp[s][i], cut[s][i] = c, j
    bounds, i = [], n
    for s in range(n_stages, 0, -1):
        j = int(cut[s][i])
        bounds.append((j, i))
        i = j
    return bounds[::-1]


def profile_unit_costs(model, n_units: int,
                       input_shape: Sequence[int],
                       microbatch: int = 1) -> List[float]:
    """Per-unit FLOP costs via XLA cost analysis: compile each
    single-unit segment once and read its flops estimate.  One-time
    (scripts/profile_pipeline_units.py embeds the result for the stock
    tower); shapes are static so the numbers are exact for that input
    size."""
    costs, shape = [], (microbatch,) + tuple(input_shape)
    for u in range(n_units):
        x = jax.ShapeDtypeStruct(shape, jnp.float32)
        vs = jax.eval_shape(
            lambda k, xs, u=u: model.init(k, xs, unit_lo=u, unit_hi=u + 1),
            jax.random.PRNGKey(0), x)
        fn = jax.jit(
            lambda v, xs, u=u: model.apply(v, xs, unit_lo=u, unit_hi=u + 1))
        compiled = fn.lower(vs, x).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):  # older jax: per-device
            analysis = analysis[0]
        costs.append(float(analysis.get("flops", 0.0)))
        shape = jax.eval_shape(fn, vs, x).shape
    return costs


# Per-unit FLOP costs for the stock InceptionResNetV2 trunk at 299x299,
# relative to the stem (XLA cost analysis via
# scripts/profile_pipeline_units.py; total 32.3 GFLOP/frame).  Only the
# RELATIVE weights matter for stage balance, and they are nearly
# input-size-independent (every unit scales with the same spatial map).
# Re-run the script if the trunk changes.
INCEPTION_RESNET_V2_UNIT_COSTS: List[float] = (
    [1.0, 0.2526] + [0.1174] * 10 + [1.1854] + [0.2924] * 20
    + [0.5139] + [0.0876] * 9 + [0.2266])


class PipelinedBackbone:
    """Stage-split inference pipeline over a unit-segmented flax trunk.

    ``model`` must accept ``unit_lo``/``unit_hi`` call arguments
    delimiting contiguous unit ranges (models/inception_resnet_v2.py).
    ``variables`` is the full trained/grafted variable tree; it is
    partitioned by stage via per-segment ``jax.eval_shape`` init (each
    unit creates only its own explicitly-named parameters, so segment
    inits recover exactly the per-stage key sets) and placed on
    ``devices`` one stage per device.
    """

    def __init__(self, model, variables, n_units: int,
                 input_shape: Sequence[int], n_stages: Optional[int] = None,
                 devices: Optional[Sequence] = None, microbatch: int = 8,
                 unit_costs: Optional[Sequence[float]] = None,
                 stage_ranges: Optional[Sequence[Tuple[int, int]]] = None,
                 preprocess: Optional[Callable] = None,
                 input_dtype=jnp.float32):
        if devices is None:
            devices = jax.devices()
            if n_stages is not None:
                if n_stages > len(devices):
                    # refuse to silently collapse: a 1-chip host asked for
                    # a 4-stage pipeline would otherwise "measure" a
                    # layout that never existed
                    raise ValueError(
                        f"pipeline needs {n_stages} devices but only "
                        f"{len(devices)} are visible — pass fewer stages "
                        f"(or devices= explicitly)")
                devices = devices[:n_stages]
        self.devices = list(devices)
        n_stages = len(self.devices)
        if n_stages < 1:
            raise ValueError("need at least one device")
        self.model = model
        self.microbatch = int(microbatch)
        if stage_ranges is None:
            costs = (list(unit_costs) if unit_costs is not None
                     else [1.0] * n_units)
            if len(costs) != n_units:
                raise ValueError(
                    f"unit_costs has {len(costs)} entries, trunk has "
                    f"{n_units} units")
            stage_ranges = split_units_balanced(costs, n_stages)
        self.stage_ranges = list(stage_ranges)
        if (self.stage_ranges[0][0] != 0
                or self.stage_ranges[-1][1] != n_units
                or any(a[1] != b[0] for a, b in zip(self.stage_ranges,
                                                    self.stage_ranges[1:]))):
            raise ValueError(
                f"stage ranges {self.stage_ranges} do not tile "
                f"[0, {n_units})")

        # discover each stage's variable keys via segment init shapes,
        # then partition the real variables; validates that the stages'
        # key sets are disjoint and exactly cover the full tree
        shape, dtype = (self.microbatch,) + tuple(input_shape), input_dtype
        self.stage_fns: List[Callable] = []
        self.stage_vars = []
        self.boundary_shapes = [shape]
        claimed = {coll: set() for coll in variables}
        for s, (lo, hi) in enumerate(self.stage_ranges):
            # ``preprocess`` (e.g. uint8 -> resize -> scale) fuses into
            # stage 0's program so raw frames ride the wire, not f32
            pre = preprocess if (s == 0 and preprocess is not None) \
                else (lambda h: h)
            x = jax.ShapeDtypeStruct(shape, dtype)
            var_shapes = jax.eval_shape(
                lambda k, xs, lo=lo, hi=hi, pre=pre: model.init(
                    k, pre(xs), unit_lo=lo, unit_hi=hi),
                jax.random.PRNGKey(0), x)
            sub = {}
            for coll, tree in var_shapes.items():
                missing = set(tree) - set(variables.get(coll, {}))
                if missing:
                    raise ValueError(
                        f"stage {s} needs {sorted(missing)[:3]} missing "
                        f"from variables[{coll!r}]")
                dup = set(tree) & claimed[coll]
                if dup:
                    raise ValueError(
                        f"stage {s} re-claims {sorted(dup)[:3]} "
                        f"({coll}) — units are not disjoint")
                claimed[coll] |= set(tree)
                sub[coll] = {k: variables[coll][k] for k in tree}
            self.stage_vars.append(jax.device_put(sub, self.devices[s]))
            self.stage_fns.append(jax.jit(
                lambda v, h, lo=lo, hi=hi, pre=pre: model.apply(
                    v, pre(h), unit_lo=lo, unit_hi=hi)))
            out = jax.eval_shape(
                lambda v, xs, lo=lo, hi=hi, pre=pre: model.apply(
                    v, pre(xs), unit_lo=lo, unit_hi=hi), var_shapes, x)
            shape, dtype = out.shape, out.dtype
            self.boundary_shapes.append(shape)
        leftovers = {coll: set(variables[coll]) - claimed.get(coll, set())
                     for coll in variables}
        leftovers = {c: v for c, v in leftovers.items() if v}
        if leftovers:
            raise ValueError(
                f"variables not claimed by any stage: "
                f"{ {c: sorted(v)[:3] for c, v in leftovers.items()} }")

    def stage_parameter_counts(self) -> List[int]:
        return [sum(int(np.prod(v.shape))
                    for v in jax.tree_util.tree_leaves(sv))
                for sv in self.stage_vars]

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        """Stream ``frames`` [B, H, W, C] through the pipeline.

        The host loop dispatches every (stage, microbatch) program
        without blocking (JAX async dispatch) — stages execute
        concurrently on their devices; the only synchronization is the
        final readback."""
        n = frames.shape[0]
        if n == 0:
            out_shape = self.boundary_shapes[-1]
            return np.zeros((0,) + tuple(out_shape[1:]), np.float32)
        mb = self.microbatch
        pad = (-n) % mb
        if pad:
            frames = np.concatenate(
                [frames, np.zeros((pad,) + frames.shape[1:], frames.dtype)])
        outs = []
        for i in range(0, frames.shape[0], mb):
            # put the host slice straight onto stage 0's device — an
            # intermediate jnp.asarray would commit to the DEFAULT device
            # first and pay the frame bytes twice when stage 0 lives
            # elsewhere (the co-tenancy case)
            h = jax.device_put(frames[i:i + mb], self.devices[0])
            for s, fn in enumerate(self.stage_fns):
                if s:
                    h = jax.device_put(h, self.devices[s])
                h = fn(self.stage_vars[s], h)
            outs.append(h)
        return np.concatenate([np.asarray(o) for o in outs])[:n]
