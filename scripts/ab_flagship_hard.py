"""Flagship quality study BELOW saturation: host vs device mining vs
int8 device-cache, multi-seed, at the hard operating point.

VERDICT r4 weak #3/#4: the round-4 flagship A/B sat at mAP 0.95+ (close
enough to ceiling that a real gap could hide in the compressed range)
and the int8 claim was worded beyond its ~0.04 standard error.  This
runs the flagship comparison at the DISCRIMINATIVE operating point the
base-model studies use (noise 2.4x class scale, converged mAP ~0.3-0.6),
3 seeds x 3 feed/mining modes, identical data/config per cell:

  host         - the reference's exact host miners
                 (multimodal_model.py:72-142 semantics)
  device       - fused --device_mining step, f32 streamed features
  device_cache - fused step fed from the int8 --device_cache (the int8
                 storage is the only difference vs `device`)

Run on the chip:
    python scripts/ab_flagship_hard.py [epochs] [noise]
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
    p.add_argument("epochs", nargs="?", type=int, default=20)
    p.add_argument("noise", nargs="?", type=float, default=2.4)
    p.add_argument("--seeds", default=",".join(str(s) for s in SEEDS),
                   help="comma list; extra seeds refine the resolution")
    p.add_argument("--modes", default="host,device,device_cache")
    a = p.parse_args()
    epochs, noise = a.epochs, a.noise
    seeds = tuple(int(x) for x in a.seeds.split(","))
    modes = tuple(a.modes.split(","))

    from multimodal_similarity_tpu.configs import TrainConfig
    from multimodal_similarity_tpu.data import generate_synthetic_honda
    from multimodal_similarity_tpu.train.trainers import multimodal_model

    root = tempfile.mkdtemp(prefix="ab_mm_hard_")
    # 8 sessions -> 4 train / 2 val (every class keeps same-class val
    # partners); hard point: class_scale 1.0 vs noise 2.4
    generate_synthetic_honda(
        root, n_sessions=8, frames_per_session=500,
        modal_dims={"sensors": (8,), "segment": (16,)},
        class_scale=1.0, noise_scale=noise, seed=7, splits=(0.5, 0.25))

    results = {}
    for mode in modes:
        for seed in seeds:
            cfg = TrainConfig(
                DATA_ROOT=root, name=f"abmh_{mode}_{seed}",
                network="rtsn", feat=["sensors", "sensors", "segment"],
                n_input=8, emb_dim=16, num_seg=3, sess_per_batch=2,
                max_epochs=epochs, static_epochs=epochs // 2,
                multimodal_epochs=max(1, epochs // 4),
                triplet_per_batch=24, learning_rate=0.01, keep_prob=1.0,
                seed=seed, silent_mode=True,
                device_cache=(mode == "device_cache")).resolve()
            t0 = time.time()
            _, metrics, _ = multimodal_model.train(
                cfg, device_mining=(mode != "host"), event_budget=48)
            results[f"{mode}/s{seed}"] = round(metrics["val_mAP"], 4)
            print(f"[{mode} seed {seed}] val mAP "
                  f"{metrics['val_mAP']:.4f} ({time.time() - t0:.0f}s)",
                  flush=True)

    print("\n| mode | " + " | ".join(f"seed {s}" for s in seeds)
          + " | mean | sigma |")
    print("|---|" + "---|" * (len(seeds) + 2))
    for mode in modes:
        vals = [results[f"{mode}/s{s}"] for s in seeds]
        sig = f"{np.std(vals, ddof=1):.3f}" if len(vals) > 1 else "n/a"
        print(f"| {mode} | " + " | ".join(f"{v:.3f}" for v in vals)
              + f" | {np.mean(vals):.3f} | {sig} |")
    print(json.dumps({"epochs": epochs, "noise": noise, **results}))


if __name__ == "__main__":
    main()
