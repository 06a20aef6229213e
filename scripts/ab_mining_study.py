"""Host-vs-device mining converged A/B study, multi-seed, on the chip.

Codifies the round-3 recorded study (RESULTS.md "Host-vs-device mining
A/B parity") so the table is reproducible from one command, and extends
the flagship rows to 3 seeds per mode (the round-3 run recorded only 2,
which the round-3 verdict called "barely an estimate").

Same acceptance framing as tests/test_mining_parity.py: retrieval-METRIC
parity (final val mAP) between the reference's exact host miners
(reference utils.py:430-496; multimodal_model.py:72-142) and the fused
device miners, same data + config + seed per cell, trained to
convergence.

Run on the chip:
    python scripts/ab_mining_study.py [base_epochs] [flagship_epochs]
Flagship-only (keeps chip time down when base rows already exist):
    python scripts/ab_mining_study.py --flagship-only
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = (3, 11, 42)


def main():
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("epochs", nargs="*", type=int,
                   help="base_epochs [mm_epochs]; with --flagship-only a "
                        "single value is the flagship epoch count")
    p.add_argument("--flagship-only", action="store_true")
    a = p.parse_args()
    flagship_only = a.flagship_only
    if flagship_only and len(a.epochs) == 1:
        base_epochs, mm_epochs = 30, a.epochs[0]
    else:
        base_epochs = a.epochs[0] if len(a.epochs) > 0 else 30
        mm_epochs = a.epochs[1] if len(a.epochs) > 1 else 20

    from multimodal_similarity_tpu.configs import TrainConfig
    from multimodal_similarity_tpu.data import generate_synthetic_honda
    from multimodal_similarity_tpu.train.trainers import (
        base_model, multimodal_model)

    root = tempfile.mkdtemp(prefix="ab_mining_")
    # the round-3 study's shape: 6 sessions, learnable but non-trivial
    # (class_scale 1.5 / noise 0.9 — converged mAP lands ~0.9, below
    # ceiling, so a real device-vs-host gap would register)
    generate_synthetic_honda(
        root, n_sessions=6, frames_per_session=800,
        modal_dims={"resnet": (2, 2, 8), "sensors": (8,), "segment": (16,)},
        class_scale=1.5, noise_scale=0.9, seed=7)

    def cfg(**kw):
        d = dict(DATA_ROOT=root, network="rtsn", feat="sensors",
                 n_input=8, emb_dim=16, num_seg=3, sess_per_batch=2,
                 triplet_per_batch=24, batch_size=32, learning_rate=0.01,
                 keep_prob=1.0, silent_mode=True)
        d.update(kw)
        return TrainConfig(**d).resolve()

    results = {}

    if not flagship_only:
        for mode in ("facenet", "facenet_host"):
            for seed in SEEDS:
                c = cfg(name=f"ab_base_{mode}_{seed}", triplet_select=mode,
                        max_epochs=base_epochs,
                        static_epochs=base_epochs // 2, seed=seed)
                t0 = time.time()
                _, metrics, _ = base_model.train(c, event_budget=64)
                results[f"base/{mode}/s{seed}"] = round(
                    metrics["val_mAP"], 4)
                print(f"[base {mode} seed {seed}] val mAP "
                      f"{metrics['val_mAP']:.4f} "
                      f"({time.time() - t0:.0f}s)", flush=True)

    for device_mining in (False, True):
        mode = "device" if device_mining else "host"
        for seed in SEEDS:
            c = cfg(name=f"ab_mm_{mode}_{seed}",
                    feat=["sensors", "sensors", "segment"],
                    multimodal_epochs=max(1, mm_epochs // 4),
                    max_epochs=mm_epochs, static_epochs=mm_epochs // 2,
                    seed=seed)
            t0 = time.time()
            _, metrics, _ = multimodal_model.train(
                c, device_mining=device_mining, event_budget=48)
            results[f"flagship/{mode}/s{seed}"] = round(
                metrics["val_mAP"], 4)
            print(f"[flagship {mode} seed {seed}] val mAP "
                  f"{metrics['val_mAP']:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    rows = sorted({k.rsplit("/", 1)[0] for k in results})
    print("\n| run | mode | " + " | ".join(f"seed {s}" for s in SEEDS)
          + " | mean |")
    print("|---|---|" + "---|" * (len(SEEDS) + 1))
    for row in rows:
        vals = [results.get(f"{row}/s{s}") for s in SEEDS]
        have = [v for v in vals if v is not None]
        cells = " | ".join("—" if v is None else f"{v:.3f}" for v in vals)
        print(f"| {row.split('/')[0]} | {row.split('/')[1]} | {cells} | "
              f"{np.mean(have):.3f} |")
    print(json.dumps({"base_epochs": base_epochs, "mm_epochs": mm_epochs,
                      **results}))


if __name__ == "__main__":
    main()
