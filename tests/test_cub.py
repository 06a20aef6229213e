"""CUB track: data contract, trainers, Recall@1 improvement."""

import numpy as np
import pytest

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.data.cub import (
    generate_synthetic_cub, load_cub, prepare_attribute, sample_cub_batch)


@pytest.fixture(scope="module")
def cub_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cub"))
    data = generate_synthetic_cub(root, n_classes=8, per_class=10,
                                  feat_dim=32, att_dim=16, noise=1.2, seed=0)
    return root, data


def _cfg(root, **kw):
    d = dict(DATA_ROOT=root, name="cub", emb_dim=24, batch_size=48,
             max_epochs=60, triplet_per_batch=32, learning_rate=0.01,
             alpha=0.2, silent_mode=True,
             train_session=["x"], val_session=["x"], test_session=["x"],
             all_session=["x"])
    d.update(kw)
    return TrainConfig(**d).resolve()


def test_load_cub_contract(cub_data):
    root, _ = cub_data
    data = load_cub(root, attributes=True)
    assert data["feat_train"].shape == (80, 32)
    assert data["label_train"].min() == 0          # 0-based after load
    assert data["label_test"].min() == 1           # raw test labels
    assert data["att_train"].shape == (80, 16)


def test_sample_cub_batch():
    class_idx = {c: list(range(c * 20, c * 20 + 20)) for c in range(6)}
    idx = sample_cub_batch(class_idx, 40, np.random.RandomState(0))
    assert len(idx) == 40
    # per-class counts between 1 (truncated) and 10
    classes = np.asarray([i // 20 for i in idx])
    counts = np.bincount(classes)
    assert counts.max() <= 10


def test_prepare_attribute(tmp_path):
    f = tmp_path / "attrs.txt"
    f.write_text("1 1 1 4 0\n1 2 1 2 0\n2 1 0 4 0\n2 3 1 3 0\n")
    out = prepare_attribute(str(f), n_images=2, n_attributes=4)
    np.testing.assert_allclose(out[0], [1.0, 0.5, 0, 0])
    np.testing.assert_allclose(out[1], [0, 0, 0.75, 0])


def test_base_model_cub_improves(cub_data, tmp_path):
    from multimodal_similarity_tpu.train.trainers import base_model_CUB
    root, data = cub_data
    cfg = _cfg(root)
    state, metrics, _ = base_model_CUB.train(
        cfg, result_dir=str(tmp_path / "cub"))
    # synthetic clusters are learnable: expect decent Recall@1
    assert metrics["val_recall@1"] > 0.5
    assert int(state.step) == 60


def test_pddm_cub(cub_data, tmp_path):
    from multimodal_similarity_tpu.train.trainers import pddm_CUB
    root, data = cub_data
    cfg = _cfg(root, max_epochs=10)
    state, metrics, _ = pddm_CUB.train(
        cfg, result_dir=str(tmp_path / "pdcub"))
    assert "val_recall@1" in metrics


@pytest.mark.slow
def test_base_cub_end_to_end(tmp_path):
    from multimodal_similarity_tpu.train.trainers import base_CUB, debug_CUB
    rng = np.random.RandomState(0)
    n_cls, per = 4, 8
    labels = np.repeat(np.arange(1, n_cls + 1), per)
    base = rng.rand(n_cls, 1, 1, 3)
    imgs = np.clip(base[labels - 1]
                   + 0.2 * rng.rand(len(labels), 64, 64, 3), 0, 1)
    data = {"image_train": imgs.astype(np.float32), "label_train": labels,
            "image_test": imgs.astype(np.float32), "label_test": labels}
    cfg = _cfg(str(tmp_path), max_epochs=3, batch_size=16, loss="triplet",
               emb_dim=16)
    state, metrics, _ = base_CUB.train(cfg, data=data, crop=56,
                                       result_dir=str(tmp_path / "e2e"))
    assert int(state.step) == 3
    # debug harness runs 2 epochs regardless
    cfg2 = _cfg(str(tmp_path), max_epochs=99, batch_size=16, loss="mylifted",
                emb_dim=16)
    state2, _, _ = debug_CUB.train(cfg2, data=data, crop=56,
                                   result_dir=str(tmp_path / "dbg"))
    assert int(state2.step) == 2
