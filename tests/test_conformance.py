"""Real-data readiness conformance drill.

Writes files in the reference's exact on-disk formats and drives the
package CLIs (argv surface, not Python APIs) against them — so the day
real CUB-200-2011 / Honda HDD data is mounted, the documented one-command
recipes in docs/REAL_DATA.md are already proven to parse, train,
checkpoint, and evaluate.

Reference contracts:
  CUB   — feat_train/feat_test [N, 1024] f32, label_train/label_test
          1-indexed ints, att_train/att_test [N, 312]
          (base_model_CUB.py:161-165, pddm_CUB.py:193-198).
  Honda — features/<session>.npy (+ modality suffixes), labels/
          <session>_goal.pkl {label, s, G}, session-list txt files
          (data_io.py:73-106, base_config.py:82-85).
"""

import glob
import json
import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cub_root(tmp_path_factory):
    """Reference-format CUB directory, written by hand (not by this
    package's generators) to pin the contract independently."""
    rng = np.random.RandomState(0)
    root = str(tmp_path_factory.mktemp("cub_fmt"))
    n_classes, per = 6, 10
    centers = rng.randn(n_classes, 1024)
    att_centers = rng.rand(n_classes, 312)

    def split():
        labels = np.repeat(np.arange(1, n_classes + 1), per)  # 1-indexed
        feats = (centers[labels - 1]
                 + 0.8 * rng.randn(len(labels), 1024)).astype(np.float32)
        atts = np.clip(att_centers[labels - 1]
                       + 0.1 * rng.randn(len(labels), 312),
                       0, 1).astype(np.float32)
        return feats, atts, labels.astype(np.int64)

    for name in ("train", "test"):
        feats, atts, labels = split()
        np.save(os.path.join(root, f"feat_{name}.npy"), feats)
        np.save(os.path.join(root, f"label_{name}.npy"), labels)
        np.save(os.path.join(root, f"att_{name}.npy"), atts)
    return root


@pytest.mark.slow
def test_cub_cli_base_model(cub_root, tmp_path):
    """The documented CUB one-command path: train + checkpoint from the
    reference directory via argv only."""
    from multimodal_similarity_tpu.train.trainers import base_model_CUB

    base_model_CUB.main([
        "--DATA_ROOT", cub_root, "--name", "conf_cub",
        "--emb_dim", "16", "--batch_size", "32", "--max_epochs", "30",
        "--learning_rate", "0.01", "--triplet_select", "facenet",
        "--silent_mode",
    ])
    runs = glob.glob(os.path.join(cub_root, "results", "conf_cub*"))
    assert runs, "no result dir written"
    ckpts = glob.glob(os.path.join(runs[0], "*.ckpt-*"))
    assert ckpts, "no checkpoint written"
    # metrics logged and finite
    log = os.path.join(runs[0], "metrics.jsonl")
    assert os.path.exists(log)
    rows = [json.loads(l) for l in open(log)]
    maps = [r["val_mAP"] for r in rows if "val_mAP" in r]
    assert maps and np.isfinite(maps[-1])


@pytest.mark.slow
def test_cub_cli_pddm_attributes(cub_root):
    """PDDM on the 312-d attribute track via argv (pddm_CUB.py:193-198)."""
    from multimodal_similarity_tpu.train.trainers import pddm_CUB

    pddm_CUB.main([
        "--DATA_ROOT", cub_root, "--name", "conf_pddm",
        "--emb_dim", "16", "--batch_size", "32", "--max_epochs", "10",
        "--learning_rate", "0.01", "--silent_mode",
    ])
    runs = glob.glob(os.path.join(cub_root, "results", "conf_pddm*"))
    assert runs and glob.glob(os.path.join(runs[0], "*.ckpt-*"))


@pytest.fixture(scope="module")
def honda_root(tmp_path_factory):
    """Reference-format Honda directory written BY HAND: raw per-frame
    feature .npy files, {label, s, G} label pickles, session-list txts —
    independent of this package's synthetic generator."""
    rng = np.random.RandomState(3)
    root = str(tmp_path_factory.mktemp("honda_fmt"))
    feat_dir = os.path.join(root, "features")
    label_dir = os.path.join(root, "labels")
    os.makedirs(feat_dir)
    os.makedirs(label_dir)

    sessions = [f"201703{i:06d}" for i in range(5)]
    centers = rng.randn(8, 8) * 1.5
    for sess in sessions:
        # run-length segments: alternating background / foreground
        seg_labels, seg_lens = [], []
        t = 0
        k = 0
        while t < 400:
            length = int(rng.randint(8, 40))
            label = 0 if k % 2 == 0 else int(rng.randint(1, 8))
            seg_labels.append(label)
            seg_lens.append(length)
            t += length
            k += 1
        seg_lens[-1] -= t - 400
        n_frames = sum(seg_lens)
        frame_labels = np.repeat(seg_labels, seg_lens)
        # raw label pickle: RLE boundaries s (len(G)+1, incl. the end),
        # per-segment G, per-frame label (parse_annotation.py:133)
        s = np.concatenate([[0], np.cumsum(seg_lens)])
        pkl = {"label": frame_labels.astype(np.int64),
               "s": s.astype(np.int64),
               "G": np.asarray(seg_labels, np.int64)}
        with open(os.path.join(label_dir, sess + "_goal.pkl"), "wb") as f:
            pickle.dump(pkl, f)
        feats = (centers[frame_labels]
                 + rng.randn(n_frames, 8)).astype(np.float32)
        np.save(os.path.join(feat_dir, sess + "_sensors_normalized.npy"),
                feats)
        # segment modality (spatial-pyramid histogram contract,
        # extract_seg_feature.py; dims read from data, 16-d here)
        seg_centers = rng.rand(8, 16) * 1.5
        seg = np.abs(seg_centers[frame_labels]
                     + 0.3 * rng.randn(n_frames, 16)).astype(np.float32)
        np.save(os.path.join(feat_dir, sess + "_seg_sp.npy"), seg)

    for name, subset in (("all_session.txt", sessions),
                         ("train_session.txt", sessions[:3]),
                         ("val_session.txt", sessions[3:4]),
                         ("test_session.txt", sessions[4:])):
        with open(os.path.join(root, name), "w") as f:
            f.write("\n".join(subset))
    return root


def test_honda_cli_train_then_eval(honda_root):
    """Honda recipe: train via argv, then evaluate the checkpoint via the
    eval CLI with the scope-remapped restore (evaluate_model.py:59-63)."""
    from multimodal_similarity_tpu.eval import evaluate_model
    from multimodal_similarity_tpu.train.trainers import base_model

    base_model.main([
        "--DATA_ROOT", honda_root, "--name", "conf_honda",
        "--network", "rtsn", "--feat", "sensors", "--n_input", "8",
        "--emb_dim", "16", "--num_seg", "3", "--sess_per_batch", "2",
        "--max_epochs", "2", "--triplet_per_batch", "24",
        "--event_per_batch", "64",
        "--learning_rate", "0.01", "--triplet_select", "facenet_host",
        "--silent_mode",
    ])
    runs = glob.glob(os.path.join(honda_root, "results", "conf_honda*"))
    assert runs
    ckpts = sorted(glob.glob(os.path.join(runs[0], "*.ckpt-*")))
    assert ckpts

    evaluate_model.main([
        "--DATA_ROOT", honda_root, "--name", "conf_honda_eval",
        "--network", "rtsn", "--feat", "sensors", "--n_input", "8",
        "--emb_dim", "16", "--num_seg", "3",
        "--model_path", ckpts[-1], "--silent_mode",
    ])
    # results.pkl lands next to the checkpoint (reference
    # evaluate_model.py:127-134 dumps into the model's result dir)
    pkl_path = os.path.join(os.path.dirname(ckpts[-1]), "results.pkl")
    assert os.path.exists(pkl_path), "evaluate_model must dump results.pkl"
    with open(pkl_path, "rb") as f:
        results = pickle.load(f)
    assert np.isfinite(results["mAP"])


def test_honda_cli_baseline_eval(honda_root):
    """No-model pooled baseline CLI against the same directory
    (reference evaluate.py:36-78)."""
    from multimodal_similarity_tpu.eval import evaluate_baseline

    results = evaluate_baseline.main([
        "--DATA_ROOT", honda_root, "--name", "conf_base",
        "--feat", "sensors", "--n_input", "8",
        "--preprocess_func", "mean", "--silent_mode",
    ])
    assert np.isfinite(results["mAP"])


@pytest.mark.slow
def test_honda_cli_pddm_to_multimodal_restore_chain(honda_root):
    """The one reference workflow crossing trainers: pretrain PDDM branch
    checkpoints (train_pddm.sh -> pddm_model.py), then restore them into
    the flagship via --sensors_path/--segment_path
    (multimodal_model.py:376-379) — driven entirely through argv."""
    from multimodal_similarity_tpu.train.trainers import (
        multimodal_model, pddm_model)

    common = ["--DATA_ROOT", honda_root, "--network", "rtsn",
              "--num_seg", "3", "--sess_per_batch", "2",
              "--event_per_batch", "48", "--triplet_per_batch", "12",
              "--learning_rate", "0.01", "--silent_mode"]
    # branch encoders must match the flagship's 32-d PDDM embedding width
    pddm_model.main(common + ["--name", "conf_pddm_sens",
                              "--feat", "sensors", "--n_input", "8",
                              "--emb_dim", "32", "--max_epochs", "1"])
    pddm_model.main(common + ["--name", "conf_pddm_seg",
                              "--feat", "segment", "--n_input", "16",
                              "--emb_dim", "32", "--max_epochs", "1"])

    def latest_ckpt(name):
        runs = glob.glob(os.path.join(honda_root, "results", name + "*"))
        assert runs, name
        ckpts = sorted(glob.glob(os.path.join(runs[-1], "*.ckpt-*")))
        assert ckpts, name
        return ckpts[-1]

    sens_ckpt = latest_ckpt("conf_pddm_sens")
    seg_ckpt = latest_ckpt("conf_pddm_seg")

    multimodal_model.main(common + [
        "--name", "conf_mm_chain", "--feat", "sensors,sensors,segment",
        "--n_input", "8", "--emb_dim", "16",
        "--sensors_path", sens_ckpt, "--segment_path", seg_ckpt,
        "--multimodal_epochs", "1", "--max_epochs", "2",
        "--lambda_multimodal", "1.0",
    ])
    runs = glob.glob(os.path.join(honda_root, "results", "conf_mm_chain*"))
    assert runs
    assert glob.glob(os.path.join(runs[-1], "*.ckpt-*"))
    log = os.path.join(runs[-1], "metrics.jsonl")
    rows = [json.loads(l) for l in open(log)]
    maps = [r["val_mAP"] for r in rows if "val_mAP" in r]
    assert maps and np.isfinite(maps[-1])
    # the PDDM-mined epoch actually engaged (hard mining counts logged)
    hards = [r.get("hard_count", 0) for r in rows]
    assert any(h > 0 for h in hards), "PDDM hard mining never engaged"
