"""End-to-end smoke tests for each trainer on tiny synthetic data."""

import numpy as np
import pytest

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.data import generate_synthetic_honda


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("honda_tr"))
    generate_synthetic_honda(
        root, n_sessions=5, frames_per_session=300,
        modal_dims={"resnet": (2, 2, 8), "sensors": (8,), "segment": (16,)},
        class_scale=1.0, noise_scale=1.0, seed=0)
    return root


def _cfg(root, **kw):
    d = dict(DATA_ROOT=root, name="t", network="rtsn", feat="sensors",
             n_input=8, emb_dim=16, num_seg=3, sess_per_batch=2,
             max_epochs=1, triplet_per_batch=24, batch_size=32,
             learning_rate=0.01, keep_prob=0.9, silent_mode=True)
    d.update(kw)
    return TrainConfig(**d).resolve()


def test_batchhard_trainer(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import base_model_batchhard
    cfg = _cfg(synth_root)
    state, metrics, _ = base_model_batchhard.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "bh"))
    assert int(state.step) >= 1
    assert np.isfinite(metrics["val_mAP"])


def test_deferred_logging_records_every_train_step(synth_root, tmp_path):
    """The trainers' deferred metrics readback (--log_flush_every) must
    not drop or reorder step records: metrics.jsonl carries one record
    per optimizer step, in order, same as the synchronous path."""
    import json

    from multimodal_similarity_tpu.train.trainers import base_model_batchhard
    cfg = _cfg(synth_root, log_flush_every=3, max_epochs=2)
    state, metrics, rd = base_model_batchhard.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "dl"))
    recs = [json.loads(l) for l in
            open(rd + "/metrics.jsonl").read().strip().split("\n")]
    train_steps = [r["step"] for r in recs if "loss" in r]
    assert train_steps == list(range(1, int(state.step) + 1))
    assert all("learning_rate" in r for r in recs if "loss" in r)
    val_steps = [r["step"] for r in recs if "val_mAP" in r]
    assert val_steps and val_steps[-1] == int(state.step)


def test_lifted_trainer(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import base_model_lifted
    cfg = _cfg(synth_root)
    state, metrics, _ = base_model_lifted.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "li"))
    assert int(state.step) >= 1


def test_classifier_trainer(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import base_model_classifier
    cfg = _cfg(synth_root, network="convtsn", feat="resnet", n_h=2, n_w=2,
               n_C=4)
    state, metrics, _ = base_model_classifier.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "cl"))
    assert 0.0 <= metrics["val_accuracy"] <= 1.0


def test_multitask_trainer(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import multitask_model
    cfg = _cfg(synth_root, lambda_ver=0.5)
    state, metrics, _ = multitask_model.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "mt"))
    assert int(state.step) >= 1
    assert np.isfinite(metrics["val_mAP"])


def test_pairsim_trainer(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import pairsim_model
    cfg = _cfg(synth_root, batch_size=16, negative_epochs=0)
    state, metrics, _ = pairsim_model.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "ps"))
    assert 0.0 <= metrics["val_acc"] <= 1.0


def test_pddm_trainer(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import pddm_model
    cfg = _cfg(synth_root)
    state, metrics, _ = pddm_model.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "pd"))
    assert np.isfinite(metrics["val_mAP_PDDM"])


def test_multimodal_trainer(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import multimodal_model
    cfg = _cfg(synth_root, network="convrtsn", feat=["resnet", "sensors",
                                                    "segment"],
               n_h=2, n_w=2, n_C=4, lambda_multimodal=0.5,
               multimodal_epochs=0, label_num=3)
    cfg.feat_dim["segment"] = (16,)
    state, metrics, rd = multimodal_model.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "mm"))
    assert int(state.step) >= 1
    assert np.isfinite(metrics["val_mAP"])


def test_multimodal_hardonly_trainer(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import (
        multimodal_model_hardonly)
    cfg = _cfg(synth_root, network="convrtsn",
               feat=["resnet", "sensors", "segment"], n_h=2, n_w=2, n_C=4,
               lambda_multimodal=0.5, multimodal_epochs=0, label_num=3)
    cfg.feat_dim["segment"] = (16,)
    state, metrics, _ = multimodal_model_hardonly.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "mh"))
    assert int(state.step) >= 1


def test_multimodal_weak_trainer(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import multimodal_model_weak
    cfg = _cfg(synth_root, network="convrtsn", feat=["resnet", "sensors"],
               n_h=2, n_w=2, n_C=4, lambda_multimodal=0.5,
               multimodal_epochs=0, label_num=2,
               multimodal_select="confidence")
    state, metrics, _ = multimodal_model_weak.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "mw"))
    assert int(state.step) >= 1


def test_hallucination_trainer(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import (
        modality_hallucination)
    cfg = _cfg(synth_root, network="convrtsn",
               feat=["resnet", "sensors", "segment"], n_h=2, n_w=2, n_C=4,
               lambda_multimodal=0.1)
    cfg.feat_dim["segment"] = (16,)
    state, metrics, _ = modality_hallucination.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "hal"))
    assert int(state.step) >= 1
    assert np.isfinite(metrics["val_mAP"])


def test_dcca_trainer(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import multitask_dcca
    cfg = _cfg(synth_root, network="convrtsn",
               feat=["resnet", "sensors", "segment"], n_h=2, n_w=2, n_C=4,
               lambda_multimodal=0.1, multimodal_epochs=0, label_num=3,
               triplet_per_batch=16)
    cfg.feat_dim["segment"] = (16,)
    state, metrics, _ = multitask_dcca.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "dc"))
    assert int(state.step) >= 1


def test_cross_prediction_multitask_trainer(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import (
        multitask_cross_prediction)
    cfg = _cfg(synth_root, network="convrtsn",
               feat=["resnet", "sensors", "segment"], n_h=2, n_w=2, n_C=4,
               lambda_multimodal=0.1, multimodal_epochs=0, label_num=3,
               triplet_per_batch=16)
    cfg.feat_dim["segment"] = (16,)
    state, metrics, _ = multitask_cross_prediction.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "cp"))
    assert int(state.step) >= 1


def test_cross_prediction_trainer(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import cross_prediction
    cfg = _cfg(synth_root, network="convrtsn", feat=["resnet", "sensors"],
               n_h=2, n_w=2, n_C=4)
    state, metrics, _ = cross_prediction.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "cx"))
    assert np.isfinite(metrics["train_mse"])


def test_pretrain_sae_trainer(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import unimodal_pretrain_sae
    cfg = _cfg(synth_root)
    state, metrics, _ = unimodal_pretrain_sae.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "sae"))
    assert np.isfinite(metrics["val_mse"])


def test_pretrain_cluster_and_pairsim(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import (
        unimodal_pretrain_cluster, unimodal_pretrain_pairsim,
        unimodal_pretrain_sae)
    cfg = _cfg(synth_root, max_epochs=1)
    state, _, sae_dir = unimodal_pretrain_sae.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "sae2"))
    ckpt = [p for p in __import__("os").listdir(sae_dir)
            if ".ckpt-" in p][0]
    cfg.model_path = str(tmp_path / "sae2" / ckpt)
    kdir = unimodal_pretrain_cluster.run(
        cfg, result_dir=str(tmp_path / "km"))
    import os
    assert os.path.exists(os.path.join(kdir, "train_data.pkl"))
    cfg2 = _cfg(synth_root, max_epochs=1)
    cfg2.model_path = cfg.model_path
    state, metrics, _ = unimodal_pretrain_pairsim.train(
        cfg2, train_data_path=os.path.join(kdir, "train_data.pkl"),
        result_dir=str(tmp_path / "pp"))
    assert 0.0 <= metrics["val_acc"] <= 1.0


def test_base_model_tf_trainer(synth_root, tmp_path):
    import functools
    from multimodal_similarity_tpu.data import prepare_dataset
    from multimodal_similarity_tpu.data.tfrecords import (
        generate_event_tfrecords)
    from multimodal_similarity_tpu.train.trainers import base_model_tf

    cfg = _cfg(synth_root, network="convlstm", feat="sensors", n_C=4,
               triplet_per_batch=16)
    cfg.feat_dim["sensors"] = (8,)
    cfg.MAX_LENGTH_FRAMES = 45
    ds = prepare_dataset(cfg.feature_root, cfg.train_session + cfg.val_session,
                         "sensors", cfg.label_root)
    n = generate_event_tfrecords(ds, cfg.tfrecords_root, ["sensors"])
    assert n > 0
    state, metrics, _ = base_model_tf.train(
        cfg, event_per_batch=16, result_dir=str(tmp_path / "tf"))
    assert int(state.step) >= 1


def test_multimodal_trainer_device_mining(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import multimodal_model
    cfg = _cfg(synth_root, network="convrtsn",
               feat=["resnet", "sensors", "segment"], n_h=2, n_w=2, n_C=4,
               lambda_multimodal=0.5, multimodal_epochs=0, label_num=3,
               triplet_per_batch=16)
    cfg.feat_dim["segment"] = (16,)
    state, metrics, _ = multimodal_model.train(
        cfg, device_mining=True, event_budget=48,
        result_dir=str(tmp_path / "mmdev"))
    assert int(state.step) >= 1
    assert np.isfinite(metrics["val_mAP"])


def test_multimodal_fused_staging(synth_root, tmp_path):
    """Before multimodal_epochs the fused step must train the labeled loss
    only (hard/struct groups masked to zero)."""
    from multimodal_similarity_tpu.train.trainers import multimodal_model
    cfg = _cfg(synth_root, network="convrtsn",
               feat=["resnet", "sensors", "segment"], n_h=2, n_w=2, n_C=4,
               lambda_multimodal=0.5, multimodal_epochs=99, label_num=3,
               triplet_per_batch=16)
    cfg.feat_dim["segment"] = (16,)
    state, metrics, rd = multimodal_model.train(
        cfg, device_mining=True, event_budget=48,
        result_dir=str(tmp_path / "stage"))
    import json
    lines = [json.loads(l) for l in
             open(f"{tmp_path}/stage/metrics.jsonl").read().strip()
             .split("\n")]
    step_lines = [l for l in lines if "hard_count" in l]
    assert step_lines, "no training steps logged"
    for l in step_lines:
        assert l["hard_count"] == 0.0
        assert l["struct_count"] == 0.0
        assert l["metric_loss2"] == 0.0


@pytest.mark.slow
def test_multimodal_fused_hard_only(synth_root, tmp_path):
    """--device_mining with the hard-only ablation must DROP the structure
    term entirely (struct_count/loss3 == 0 even past multimodal_epochs) —
    the ablation otherwise silently trains the full flagship objective."""
    import json

    from multimodal_similarity_tpu.train.trainers import multimodal_model
    cfg = _cfg(synth_root, network="convrtsn",
               feat=["resnet", "sensors", "segment"], n_h=2, n_w=2, n_C=4,
               lambda_multimodal=0.5, multimodal_epochs=0, label_num=3,
               triplet_per_batch=16)
    cfg.feat_dim["segment"] = (16,)
    multimodal_model.train(cfg, hard_only=True, device_mining=True,
                           event_budget=48,
                           result_dir=str(tmp_path / "ho"))
    lines = [json.loads(l) for l in
             open(f"{tmp_path}/ho/metrics.jsonl").read().strip()
             .split("\n")]
    step_lines = [l for l in lines if "struct_count" in l]
    assert step_lines, "no training steps logged"
    assert any(l["hard_count"] > 0 for l in step_lines), \
        "hard mining never engaged; test data too easy"
    for l in step_lines:
        assert l["struct_count"] == 0.0
        assert l["metric_loss3"] == 0.0


@pytest.mark.slow
def test_honda_experiment_trainers_preempt(synth_root, tmp_path, monkeypatch):
    """Every HondaExperiment-based trainer checkpoints and exits on a
    preemption signal instead of running out its epoch budget (the guard
    is installed by the shared scaffolding, trainers/_honda.py)."""
    import glob
    import os

    from multimodal_similarity_tpu.utils import preemption as _pre

    class FiringGuard(_pre.PreemptionGuard):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self._checks = 0

        def install(self):
            return self

        def restore(self):
            pass

        @property
        def should_stop(self):
            self._checks += 1
            if self._checks > 2:
                self.request_stop()
            return self._stop.is_set()

    monkeypatch.setattr(_pre, "PreemptionGuard", FiringGuard)
    from multimodal_similarity_tpu.train.trainers import (
        base_model_batchhard, pddm_model, unimodal_pretrain_sae)

    for i, (mod, kw) in enumerate([
            (base_model_batchhard, {}),
            (pddm_model, {}),
            (unimodal_pretrain_sae, {"network": "seq2seq"})]):
        cfg = _cfg(synth_root, max_epochs=50, **kw)
        rd = str(tmp_path / f"pre{i}")
        state, metrics, out_dir = mod.train(cfg, event_budget=48,
                                            result_dir=rd)
        assert int(state.step) <= 4, (mod.__name__, int(state.step))
        ckpts = glob.glob(os.path.join(out_dir, "*.ckpt-*"))
        assert any(c.endswith(f".ckpt-{int(state.step)}") for c in ckpts), \
            (mod.__name__, ckpts)


@pytest.mark.slow
def test_flagship_device_mining_preempts(synth_root, tmp_path, monkeypatch):
    """The fused --device_mining path (the only --multihost path) must hit
    the preemption poll too — its `continue` used to skip the check,
    making SIGTERM a no-op for fused runs."""
    import glob
    import os

    from multimodal_similarity_tpu.utils import preemption as _pre

    class FiringGuard(_pre.PreemptionGuard):
        _checks = 0

        def install(self):
            return self

        def restore(self):
            pass

        @property
        def should_stop(self):
            FiringGuard._checks += 1
            if FiringGuard._checks > 2:
                self.request_stop()
            return self._stop.is_set()

    monkeypatch.setattr(_pre, "PreemptionGuard", FiringGuard)
    from multimodal_similarity_tpu.train.trainers import multimodal_model
    cfg = _cfg(synth_root, network="convrtsn",
               feat=["resnet", "sensors", "segment"], n_h=2, n_w=2, n_C=4,
               lambda_multimodal=0.5, multimodal_epochs=0, label_num=3,
               triplet_per_batch=16, max_epochs=50)
    cfg.feat_dim["segment"] = (16,)
    state, metrics, out_dir = multimodal_model.train(
        cfg, device_mining=True, event_budget=48,
        result_dir=str(tmp_path / "fp"))
    assert int(state.step) <= 8, int(state.step)
    ckpts = glob.glob(os.path.join(out_dir, "*.ckpt-*"))
    assert any(c.endswith(f".ckpt-{int(state.step)}") for c in ckpts), ckpts


@pytest.mark.slow
def test_flagship_device_mining_int8(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import multimodal_model
    cfg = _cfg(synth_root, network="convrtsn",
               feat=["resnet", "sensors", "segment"], n_h=2, n_w=2, n_C=4,
               lambda_multimodal=0.5, multimodal_epochs=0, label_num=3,
               triplet_per_batch=16, int8_features=True)
    cfg.feat_dim["segment"] = (16,)
    state, metrics, _ = multimodal_model.train(
        cfg, device_mining=True, event_budget=48,
        result_dir=str(tmp_path / "i8f"))
    assert int(state.step) >= 1
    assert np.isfinite(metrics["val_mAP"])


def test_batchhard_trainer_int8(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import base_model_batchhard
    cfg = _cfg(synth_root, int8_features=True)
    state, metrics, _ = base_model_batchhard.train(
        cfg, event_budget=48, result_dir=str(tmp_path / "bh8"))
    assert int(state.step) >= 1
    assert np.isfinite(metrics["val_mAP"])


def test_int8_rejected_by_unsupported_trainers(synth_root, tmp_path):
    """Trainers without a device-fed dequantizing step must fail loudly on
    --int8_features instead of silently shipping f32."""
    from multimodal_similarity_tpu.train.trainers import pddm_model
    with pytest.raises(ValueError, match="int8_features"):
        pddm_model.train(_cfg(synth_root, int8_features=True),
                         event_budget=48,
                         result_dir=str(tmp_path / "no8"))


def test_watchdog_stops_and_checkpoints_stalled_run(synth_root, tmp_path):
    """--watchdog_secs end-to-end: an (artificially tiny) deadline fires
    during the first step's compile, requests a preemption-style stop,
    and the trainer checkpoints the exact step instead of running on
    (VERDICT r3 #4: hang detection wired into the HondaExperiment loop)."""
    import glob

    from multimodal_similarity_tpu.train.trainers import base_model_batchhard
    cfg = _cfg(synth_root, max_epochs=50, watchdog_secs=0.01)
    rd = str(tmp_path / "wd")
    state, metrics, _ = base_model_batchhard.train(
        cfg, event_budget=48, result_dir=rd)
    # stopped at the first step boundary, far short of 50 epochs
    assert int(state.step) <= 2
    ckpts = glob.glob(rd + "/t.ckpt-*")
    assert ckpts, "preemption epilogue must checkpoint the exact step"
