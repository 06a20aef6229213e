"""InceptionV2 backbone: architecture shapes, param count, slim graft.

Reference: the slim InceptionV2 graph built in-model at
src/networks.py:916-947 and consumed by src/base_CUB.py:145.
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_similarity_tpu.models.inception_v2 import (
    ENDPOINT_CHANNELS, InceptionV2, graft_slim_variables)


@pytest.fixture(scope="module")
def init_variables():
    m = InceptionV2()
    return m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


@pytest.mark.slow
def test_endpoint_shapes_at_224():
    m = InceptionV2(capture_endpoints=True)
    x = jnp.zeros((1, 224, 224, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    (pool5, eps), _ = m.apply(variables, x, train=True,
                              mutable=["batch_stats"])
    assert pool5.shape == (1, 1024)
    # spatial sizes from the slim endpoint table
    spatial = {"Conv2d_1a_7x7": 112, "Conv2d_2b_1x1": 56,
               "Conv2d_2c_3x3": 56, "Mixed_3b": 28, "Mixed_3c": 28,
               "Mixed_4a": 14, "Mixed_4b": 14, "Mixed_4c": 14,
               "Mixed_4d": 14, "Mixed_4e": 14, "Mixed_5a": 7,
               "Mixed_5b": 7, "Mixed_5c": 7}
    for k, ch in ENDPOINT_CHANNELS.items():
        assert eps[k].shape == (1, spatial[k], spatial[k], ch), k


def _expected_param_count():
    """Independent arithmetic: conv kernels + BN betas from the slim
    channel table (no gamma, biases in BN only)."""
    total = 0

    def conv(cin, cout, k):
        nonlocal total
        total += k * k * cin * cout + cout  # kernel + BN beta

    # stem: separable 7x7 (depthwise 3ch x8 + pointwise -> 64, one BN)
    total += 7 * 7 * 3 * 8          # depthwise kernel
    total += 1 * 1 * 24 * 64 + 64   # pointwise + beta
    conv(64, 64, 1)                 # Conv2d_2b_1x1
    conv(64, 192, 3)                # Conv2d_2c_3x3

    def block(cin, b0, b1, b2, b3):
        conv(cin, b0, 1)
        conv(cin, b1[0], 1); conv(b1[0], b1[1], 3)
        conv(cin, b2[0], 1); conv(b2[0], b2[1], 3); conv(b2[1], b2[1], 3)
        conv(cin, b3, 1)
        return b0 + b1[1] + b2[1] + b3

    def reduce_block(cin, r0, r1):
        conv(cin, r0[0], 1); conv(r0[0], r0[1], 3)
        conv(cin, r1[0], 1); conv(r1[0], r1[1], 3); conv(r1[1], r1[1], 3)
        return r0[1] + r1[1] + cin

    c = 192
    c = block(c, 64, (64, 64), (64, 96), 32)        # 3b -> 256
    c = block(c, 64, (64, 96), (64, 96), 64)        # 3c -> 320
    c = reduce_block(c, (128, 160), (64, 96))       # 4a -> 576
    c = block(c, 224, (64, 96), (96, 128), 128)     # 4b
    c = block(c, 192, (96, 128), (96, 128), 128)    # 4c
    c = block(c, 160, (128, 160), (128, 160), 96)   # 4d
    c = block(c, 96, (128, 192), (160, 192), 96)    # 4e
    c = reduce_block(c, (128, 192), (192, 256))     # 5a -> 1024
    c = block(c, 352, (192, 320), (160, 224), 128)  # 5b
    c = block(c, 352, (192, 320), (192, 224), 128)  # 5c
    assert c == 1024
    return total


def test_param_count_matches_slim_table(init_variables):
    got = sum(int(np.prod(p.shape))
              for p in jax.tree_util.tree_leaves(init_variables["params"]))
    assert got == _expected_param_count() == 10_153_336


def _flax_to_slim_conv(module_name: str) -> str:
    """Inverse name rewrite, written independently of the module's own
    mapper: underscores between known scope groups become slashes."""
    if module_name.startswith("Conv2d_1a_7x7"):
        suffix = module_name[len("Conv2d_1a_7x7"):]
        return "InceptionV2/Conv2d_1a_7x7" + suffix.replace("_", "/", 1)
    m = re.match(r"(Mixed_\w+?)_(Branch_\d)_(.+)", module_name)
    if m:
        return f"InceptionV2/{m.group(1)}/{m.group(2)}/{m.group(3)}"
    return f"InceptionV2/{module_name}"


def _fake_slim_vars(variables, rng, scale=0.05):
    # small kernels: N(0,1) weights overflow f32 through 13 conv layers
    slim = {}
    for mod, leaves in variables["params"].items():
        if mod.endswith("_BatchNorm"):
            scope = _flax_to_slim_conv(mod[: -len("_BatchNorm")])
            slim[f"{scope}/BatchNorm/beta"] = (scale * rng.randn(
                *leaves["bias"].shape)).astype(np.float32)
        elif mod.endswith("_depthwise"):
            # slim stores [7,7,3,8]; the module reshapes to [7,7,1,24]
            slim["InceptionV2/Conv2d_1a_7x7/depthwise_weights"] = (
                scale * rng.randn(7, 7, 3, 8)).astype(np.float32)
        elif mod.endswith("_pointwise"):
            slim["InceptionV2/Conv2d_1a_7x7/pointwise_weights"] = (
                scale * rng.randn(*leaves["kernel"].shape)).astype(np.float32)
        else:
            slim[f"{_flax_to_slim_conv(mod)}/weights"] = (
                scale * rng.randn(*leaves["kernel"].shape)).astype(np.float32)
    for mod, leaves in variables["batch_stats"].items():
        scope = _flax_to_slim_conv(mod[: -len("_BatchNorm")])
        slim[f"{scope}/BatchNorm/moving_mean"] = (scale * rng.randn(
            *leaves["mean"].shape)).astype(np.float32)
        slim[f"{scope}/BatchNorm/moving_variance"] = (1.0 + 0.1 * np.abs(
            rng.randn(*leaves["var"].shape))).astype(np.float32)
    return slim


def test_graft_slim_variables_round_trip(init_variables, rng):
    slim = _fake_slim_vars(init_variables, rng)
    # non-trunk variables must be skipped silently
    slim["InceptionV2/Logits/Conv2d_1c_1x1/weights"] = np.zeros((1, 1, 1024, 1001))
    slim["global_step"] = np.zeros(())

    grafted = graft_slim_variables(init_variables, slim)
    # every grafted leaf must equal its slim source
    beta = grafted["params"]["Mixed_4b_Branch_0_Conv2d_0a_1x1_BatchNorm"]["bias"]
    np.testing.assert_array_equal(
        np.asarray(beta),
        slim["InceptionV2/Mixed_4b/Branch_0/Conv2d_0a_1x1/BatchNorm/beta"])
    dw = grafted["params"]["Conv2d_1a_7x7_depthwise"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(dw),
        slim["InceptionV2/Conv2d_1a_7x7/depthwise_weights"].reshape(
            7, 7, 1, 24))
    # outputs change after grafting (weights actually landed)
    m = InceptionV2()
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    y0 = m.apply(init_variables, x)
    y1 = m.apply(grafted, x)
    assert bool(jnp.all(jnp.isfinite(y1)))
    assert float(jnp.max(jnp.abs(y1 - y0))) > 1e-3


def test_graft_rejects_partial_and_misshaped(init_variables, rng):
    slim = _fake_slim_vars(init_variables, rng)
    missing = dict(slim)
    missing.pop("InceptionV2/Mixed_5b/Branch_1/Conv2d_0b_3x3/weights")
    with pytest.raises(KeyError):
        graft_slim_variables(init_variables, missing)

    bad = dict(slim)
    bad["InceptionV2/Mixed_5b/Branch_1/Conv2d_0b_3x3/weights"] = \
        np.zeros((3, 3, 8, 8), np.float32)
    with pytest.raises(ValueError):
        graft_slim_variables(init_variables, bad)


@pytest.mark.slow
def test_base_cub_trains_with_inception_tower(tmp_path, rng):
    """End-to-end base_CUB with the real tower (random init) on synthetic
    images: runs, updates BN stats, improves the metric loss."""
    from multimodal_similarity_tpu.configs import TrainConfig
    from multimodal_similarity_tpu.train.trainers import base_CUB

    n, hw, n_classes = 48, 64, 4
    labels = rng.randint(0, n_classes, size=n)
    base = rng.rand(n_classes, hw, hw, 3) * 0.6 + 0.2
    images = np.clip(base[labels] + rng.randn(n, hw, hw, 3) * 0.05, 0, 1)
    data = {"image_train": images.astype(np.float32),
            "label_train": labels,
            "image_test": images[:16].astype(np.float32),
            "label_test": labels[:16]}

    cfg = TrainConfig(DATA_ROOT=".", name="cubi", network="inception_v2",
                      emb_dim=16, batch_size=16, max_epochs=2,
                      learning_rate=0.01, keep_prob=1.0, loss="triplet",
                      silent_mode=True, seed=0).resolve()
    state, metrics, _ = base_CUB.train(cfg, data=data, crop=56,
                                       result_dir=str(tmp_path / "cubi"))
    assert int(state.step) == 2
    assert np.isfinite(metrics["val_mAP"])
