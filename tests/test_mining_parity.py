"""Host-vs-device mining A/B parity gate.

The device miners' declared acceptance criterion is retrieval-METRIC
parity with the reference's host miners, not index-trace parity
(ops/mining.py module docstring; reference miner: utils.py:430-496).
These tests enforce it: the same synthetic dataset and config trained
with the host miner and with the fused device miner must land at final
val mAPs within a tolerance band, and both must beat the untrained
baseline by a clear margin.
"""

import numpy as np
import pytest

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.data import generate_synthetic_honda

# retrieval-metric tolerance band for A/B runs that share data + config
# but not triplet index traces (mining is stochastic in both modes).
# VARIANCE-JUSTIFIED (scripts/ab_mining_study.py, RESULTS.md "A/B
# parity"): converged TPU runs over 3 seeds per mode measured per-seed
# mAP sigma 0.038-0.064 across runs/modes, so a single-run A/B
# difference has sigma ~0.058 (base) / ~0.083 (flagship) and this band
# is 1.4-2.1 sigma; the measured MEAN gaps are 0.029 (base) and 0.017
# (flagship) — far inside it.  A tighter band (e.g. the 0.05 once
# proposed) is under 1 sigma of flagship seed noise and would
# false-fail regularly unless the gate averaged several seeds per mode.
MAP_TOLERANCE = 0.12


@pytest.fixture(scope="module")
def parity_root(tmp_path_factory):
    # learnable but non-trivial, with a val session large enough (~15+
    # foreground events) that mAP granularity is much finer than the
    # tolerance band — a 300-frame val session quantizes mAP to ~0.25
    # steps, which swamps the A/B signal
    root = str(tmp_path_factory.mktemp("honda_ab"))
    generate_synthetic_honda(
        root, n_sessions=6, frames_per_session=800,
        modal_dims={"resnet": (2, 2, 8), "sensors": (8,), "segment": (16,)},
        class_scale=1.5, noise_scale=0.9, seed=7)
    return root


def _cfg(root, **kw):
    d = dict(DATA_ROOT=root, name="ab", network="rtsn", feat="sensors",
             n_input=8, emb_dim=16, num_seg=3, sess_per_batch=2,
             max_epochs=5, triplet_per_batch=24, batch_size=32,
             learning_rate=0.01, keep_prob=1.0, silent_mode=True, seed=3)
    d.update(kw)
    return TrainConfig(**d).resolve()


def test_base_model_host_vs_device_mining(parity_root, tmp_path):
    """facenet (fused on-device semi-hard) vs facenet_host (the
    reference's exact NumPy miner): same data, same config, same seed."""
    from multimodal_similarity_tpu.train.trainers import base_model

    results = {}
    for mode in ("facenet", "facenet_host"):
        cfg = _cfg(parity_root, triplet_select=mode)
        _, metrics, _ = base_model.train(
            cfg, event_budget=64, result_dir=str(tmp_path / mode))
        results[mode] = metrics["val_mAP"]

    # untrained baseline on the same val split
    cfg0 = _cfg(parity_root, triplet_select="facenet", max_epochs=0)
    try:
        _, m0, _ = base_model.train(cfg0, event_budget=64,
                                    result_dir=str(tmp_path / "init"))
        base = m0.get("val_mAP", None)
    except Exception:
        base = None

    dev, host = results["facenet"], results["facenet_host"]
    assert np.isfinite(dev) and np.isfinite(host)
    assert abs(dev - host) < MAP_TOLERANCE, results
    if base is not None and np.isfinite(base):
        assert dev > base + 0.03, (dev, base)
        assert host > base + 0.03, (host, base)


@pytest.mark.slow
def test_multimodal_device_mining_ab(parity_root, tmp_path):
    """Flagship trainer: --device_mining on vs off, same data/config/seed;
    final val mAP within the band (reference flow: multimodal_model.py
    main loop; device path = the fully-fused step)."""
    from multimodal_similarity_tpu.train.trainers import multimodal_model

    results = {}
    for device_mining in (False, True):
        cfg = _cfg(parity_root, feat=["sensors", "sensors", "segment"],
                   n_input=8, multimodal_epochs=1, max_epochs=3)
        _, metrics, _ = multimodal_model.train(
            cfg, device_mining=device_mining, event_budget=48,
            result_dir=str(tmp_path / f"mm{int(device_mining)}"))
        results[device_mining] = metrics["val_mAP"]

    off, on = results[False], results[True]
    assert np.isfinite(off) and np.isfinite(on)
    assert abs(on - off) < MAP_TOLERANCE, results
