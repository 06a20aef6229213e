"""Feature-precision quality study: f32 vs bf16 vs int8, multi-seed.

VERDICT r3 #3: the int8 quality-parity evidence sat at/near mAP
saturation; this runs the controlled comparison at the DISCRIMINATIVE
operating point (hard synthetic: noise >= 2.2x class scale, where
converged mAP lands well below 1.0), 3 seeds x 3 feed modes to
convergence, identical data/config per cell.  Results feed RESULTS.md's
precision table and justify test_int8_features_quality_parity's band.

Run on the chip:
    python scripts/ab_quality_study.py [epochs] [noise]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    noise = float(sys.argv[2]) if len(sys.argv) > 2 else 2.4
    seeds = (3, 11, 42)
    modes = ("f32", "bf16", "int8")

    from multimodal_similarity_tpu.configs import TrainConfig
    from multimodal_similarity_tpu.data import generate_synthetic_honda
    from multimodal_similarity_tpu.train.trainers import base_model

    root = tempfile.mkdtemp(prefix="ab_quality_")
    # 8 sessions -> 4 train / 2 val: enough val events that every class
    # has same-class partners (a 1-session val set can NaN the mAP)
    generate_synthetic_honda(
        root, n_sessions=8, frames_per_session=500,
        modal_dims={"resnet": (2, 2, 24)},
        class_scale=1.0, noise_scale=noise, seed=7, splits=(0.5, 0.25))

    results = {}
    for mode in modes:
        for seed in seeds:
            cfg = TrainConfig(
                DATA_ROOT=root, name=f"ab_{mode}_{seed}",
                network="convrtsn", feat="resnet", n_input=24, n_h=2,
                n_w=2, n_C=8, emb_dim=32, num_seg=3, sess_per_batch=3,
                max_epochs=epochs, triplet_per_batch=32,
                learning_rate=0.02, static_epochs=epochs // 2,
                keep_prob=0.9, seed=seed, silent_mode=True,
                triplet_select="facenet",
                bf16_features=(mode == "bf16"),
                int8_features=(mode == "int8")).resolve()
            t0 = time.time()
            _, metrics, _ = base_model.train(cfg, event_budget=128)
            results[f"{mode}/s{seed}"] = round(metrics["val_mAP"], 4)
            print(f"[{mode} seed {seed}] val mAP "
                  f"{metrics['val_mAP']:.4f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)

    print("\n| mode | " + " | ".join(f"seed {s}" for s in seeds)
          + " | mean | sigma |")
    print("|---|" + "---|" * (len(seeds) + 2))
    for mode in modes:
        vals = [results[f"{mode}/s{s}"] for s in seeds]
        print(f"| {mode} | " + " | ".join(f"{v:.3f}" for v in vals)
              + f" | {np.mean(vals):.3f} | {np.std(vals, ddof=1):.3f} |")
    print(json.dumps({"epochs": epochs, "noise": noise, **results}))


if __name__ == "__main__":
    main()
