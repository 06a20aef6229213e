"""Independent NumPy forward oracles for the Inception towers.

VERDICT r3 #6: InceptionV1/V2 were pinned only to self-generated golden
endpoint statistics — a regression pin, not a correctness proof (a
branch-width or padding divergence vs slim would regenerate its own
goldens and pass).  Here the stem AND one representative mixed block of
each tower are re-implemented from scratch in NumPy (TF SAME padding,
beta-only inference BatchNorm, slim's count_include_pad=False avg pool,
V2's depthwise-separable stem) and the flax towers must match them on
RANDOM weights and random running stats — the same independent-oracle
pattern as the LSTM cell test (tests/test_models.py).

Reference architecture sources: slim inception_v1/v2 as used by
/root/reference/preprocess/feat_extract_GoogleNet.py:10-45 and
/root/reference/src/networks.py:916-947.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

EPS = 1e-3


# ---------------------------------------------------------------------------
# NumPy building blocks (written independently of the flax code)
# ---------------------------------------------------------------------------

def _same_pads(size, k, s):
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


def np_conv_same(x, w, stride=1):
    """x [H, W, Cin], w [kh, kw, Cin, Cout] — TF SAME semantics."""
    kh, kw = w.shape[:2]
    ph, pw = _same_pads(x.shape[0], kh, stride), _same_pads(
        x.shape[1], kw, stride)
    xp = np.pad(x, (ph, pw, (0, 0)))
    ho, wo = -(-x.shape[0] // stride), -(-x.shape[1] // stride)
    out = np.zeros((ho, wo, w.shape[3]), np.float32)
    for i in range(kh):
        for j in range(kw):
            patch = xp[i: i + ho * stride: stride,
                       j: j + wo * stride: stride, :]
            out += patch @ w[i, j]
    return out


def np_depthwise_conv_same(x, w, stride=1):
    """Depthwise (feature_group_count=Cin): w [kh, kw, 1, Cin * mult];
    output channel o reads input channel o // mult."""
    cin = x.shape[-1]
    cout = w.shape[3]
    mult = cout // cin
    cols = []
    for o in range(cout):
        cols.append(np_conv_same(x[:, :, o // mult: o // mult + 1],
                                 w[:, :, :, o: o + 1], stride)[:, :, 0])
    return np.stack(cols, axis=-1)


def np_bn_infer(x, beta, mean, var):
    return (x - mean) / np.sqrt(var + EPS) + beta


def np_max_pool_same(x, k=3, stride=1):
    ph, pw = _same_pads(x.shape[0], k, stride), _same_pads(
        x.shape[1], k, stride)
    xp = np.pad(x, (ph, pw, (0, 0)), constant_values=-np.inf)
    ho, wo = -(-x.shape[0] // stride), -(-x.shape[1] // stride)
    out = np.full((ho, wo, x.shape[-1]), -np.inf, np.float32)
    for i in range(k):
        for j in range(k):
            out = np.maximum(out, xp[i: i + ho * stride: stride,
                                     j: j + wo * stride: stride, :])
    return out


def np_avg_pool_same_valid_count(x, k=3, stride=1):
    """slim avg_pool: padded cells excluded from the denominator."""
    ph, pw = _same_pads(x.shape[0], k, stride), _same_pads(
        x.shape[1], k, stride)
    xp = np.pad(x, (ph, pw, (0, 0)))
    ones = np.pad(np.ones(x.shape[:2] + (1,), np.float32), (ph, pw, (0, 0)))
    ho, wo = -(-x.shape[0] // stride), -(-x.shape[1] // stride)
    s = np.zeros((ho, wo, x.shape[-1]), np.float32)
    c = np.zeros((ho, wo, 1), np.float32)
    for i in range(k):
        for j in range(k):
            s += xp[i: i + ho * stride: stride, j: j + wo * stride: stride]
            c += ones[i: i + ho * stride: stride,
                      j: j + wo * stride: stride]
    return s / c


def _randomize(variables, seed):
    """Random weights, random betas, random positive running vars — so the
    oracle comparison cannot pass by zeros/identity accident."""
    rng = np.random.RandomState(seed)

    def rand(path, leaf):
        name = jax.tree_util.keystr(path)
        a = 0.5 * rng.randn(*leaf.shape).astype(np.float32)
        if name.endswith("['var']"):
            a = rng.uniform(0.5, 1.5, leaf.shape).astype(np.float32)
        if name.endswith("['mean']") or name.endswith("['bias']"):
            a = 0.3 * rng.randn(*leaf.shape).astype(np.float32)
        return jnp.asarray(a)

    return jax.tree_util.tree_map_with_path(rand, variables)


def _cb(params, stats, name, x, stride=1):
    """conv + inference BN + relu from the flax variable tree."""
    h = np_conv_same(x, np.asarray(params[name]["kernel"]), stride)
    bn = f"{name}_BatchNorm"
    h = np_bn_infer(h, np.asarray(params[bn]["bias"]),
                    np.asarray(stats[bn]["mean"]),
                    np.asarray(stats[bn]["var"]))
    return np.maximum(h, 0.0)


@pytest.mark.slow
def test_inception_v1_stem_and_mixed3b_match_numpy_oracle():
    from multimodal_similarity_tpu.models.inception_v1 import InceptionV1

    model = InceptionV1(capture_endpoints=True)
    x = np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32)
    variables = _randomize(model.init(jax.random.PRNGKey(0),
                                      jnp.asarray(x)), seed=1)
    (_, endpoints), _ = model.apply(variables, jnp.asarray(x),
                                    mutable=[])
    params, stats = variables["params"], variables["batch_stats"]

    # stem: 7x7/2 conv-bn -> maxpool/2 -> 1x1 -> 3x3 -> maxpool/2
    h = _cb(params, stats, "Conv2d_1a_7x7", x[0], stride=2)
    np.testing.assert_allclose(np.asarray(endpoints["Conv2d_1a_7x7"])[0],
                               h, rtol=2e-4, atol=2e-4)
    h = np_max_pool_same(h, 3, 2)
    h = _cb(params, stats, "Conv2d_2b_1x1", h)
    h = _cb(params, stats, "Conv2d_2c_3x3", h)
    np.testing.assert_allclose(np.asarray(endpoints["Conv2d_2c_3x3"])[0],
                               h, rtol=2e-3, atol=2e-3)
    h = np_max_pool_same(h, 3, 2)

    # Mixed_3b: 1x1 | 1x1->3x3 | 1x1->3x3 (slim's 3x3 quirk) | maxpool->1x1
    r0 = _cb(params, stats, "Mixed_3b_Branch_0_Conv2d_0a_1x1", h)
    r1 = _cb(params, stats, "Mixed_3b_Branch_1_Conv2d_0a_1x1", h)
    r1 = _cb(params, stats, "Mixed_3b_Branch_1_Conv2d_0b_3x3", r1)
    r2 = _cb(params, stats, "Mixed_3b_Branch_2_Conv2d_0a_1x1", h)
    r2 = _cb(params, stats, "Mixed_3b_Branch_2_Conv2d_0b_3x3", r2)
    r3 = _cb(params, stats, "Mixed_3b_Branch_3_Conv2d_0b_1x1",
             np_max_pool_same(h, 3, 1))
    mixed = np.concatenate([r0, r1, r2, r3], axis=-1)
    got = np.asarray(endpoints["Mixed_3b"])[0]
    assert got.shape == mixed.shape == (4, 4, 256)
    np.testing.assert_allclose(got, mixed, rtol=1e-2, atol=2e-3)


def test_inception_v2_stem_and_mixed3b_match_numpy_oracle():
    from multimodal_similarity_tpu.models.inception_v2 import InceptionV2

    model = InceptionV2(capture_endpoints=True)
    x = np.random.RandomState(1).randn(1, 32, 32, 3).astype(np.float32)
    variables = _randomize(model.init(jax.random.PRNGKey(0),
                                      jnp.asarray(x)), seed=2)
    (_, endpoints), _ = model.apply(variables, jnp.asarray(x),
                                    mutable=[])
    params, stats = variables["params"], variables["batch_stats"]

    # depthwise-separable stem: depthwise 7x7/2 (mult = min(64//3, 8) = 8)
    # -> pointwise 1x1 to 64 -> BN -> relu
    h = np_depthwise_conv_same(
        x[0], np.asarray(params["Conv2d_1a_7x7_depthwise"]["kernel"]),
        stride=2)
    assert h.shape[-1] == 24  # 3 channels x multiplier 8
    h = np_conv_same(h, np.asarray(params["Conv2d_1a_7x7_pointwise"]
                                   ["kernel"]))
    bn = "Conv2d_1a_7x7_BatchNorm"
    h = np.maximum(np_bn_infer(
        h, np.asarray(params[bn]["bias"]), np.asarray(stats[bn]["mean"]),
        np.asarray(stats[bn]["var"])), 0.0)
    np.testing.assert_allclose(np.asarray(endpoints["Conv2d_1a_7x7"])[0],
                               h, rtol=2e-4, atol=2e-4)
    h = np_max_pool_same(h, 3, 2)
    h = _cb(params, stats, "Conv2d_2b_1x1", h)
    h = _cb(params, stats, "Conv2d_2c_3x3", h)
    h = np_max_pool_same(h, 3, 2)

    # Mixed_3b: 1x1 | 1x1->3x3 | 1x1->3x3->3x3 | slim-avgpool->1x1
    r0 = _cb(params, stats, "Mixed_3b_Branch_0_Conv2d_0a_1x1", h)
    r1 = _cb(params, stats, "Mixed_3b_Branch_1_Conv2d_0a_1x1", h)
    r1 = _cb(params, stats, "Mixed_3b_Branch_1_Conv2d_0b_3x3", r1)
    r2 = _cb(params, stats, "Mixed_3b_Branch_2_Conv2d_0a_1x1", h)
    r2 = _cb(params, stats, "Mixed_3b_Branch_2_Conv2d_0b_3x3", r2)
    r2 = _cb(params, stats, "Mixed_3b_Branch_2_Conv2d_0c_3x3", r2)
    r3 = _cb(params, stats, "Mixed_3b_Branch_3_Conv2d_0b_1x1",
             np_avg_pool_same_valid_count(h, 3, 1))
    mixed = np.concatenate([r0, r1, r2, r3], axis=-1)
    got = np.asarray(endpoints["Mixed_3b"])[0]
    assert got.shape == mixed.shape == (4, 4, 256)
    np.testing.assert_allclose(got, mixed, rtol=1e-2, atol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize("which", ["v1", "v2"])
def test_avg_endpoint_is_spatial_mean(which):
    """The 1024-d output equals the spatial mean of the last endpoint —
    the AvgPool_0a_7x7 / AvgPool_1a global-average contract."""
    if which == "v1":
        from multimodal_similarity_tpu.models.inception_v1 import InceptionV1
        model, last = InceptionV1(capture_endpoints=True), "Mixed_5c"
    else:
        from multimodal_similarity_tpu.models.inception_v2 import InceptionV2
        model, last = InceptionV2(capture_endpoints=True), "Mixed_5c"
    x = jnp.asarray(np.random.RandomState(2).randn(2, 32, 32, 3)
                    .astype(np.float32))
    variables = _randomize(model.init(jax.random.PRNGKey(0), x), seed=3)
    (pooled, endpoints), _ = model.apply(variables, x, mutable=[])
    np.testing.assert_allclose(
        np.asarray(pooled), np.asarray(endpoints[last]).mean(axis=(1, 2)),
        rtol=1e-5, atol=1e-5)
