"""On-chip soak of the shipped flagship defaults: fused device mining +
device cache + multi-step dispatch.

Mirrors the round-4 cached flagship soak (three cached modalities at
8x8x96 video dims, noise 2.2x class scale, labeled semi-hard + PDDM
hard/structure mining) with --steps_per_dispatch 8 — the configuration
scripts/train_multimodal_fused.sh now ships — and records convergence +
wall time for RESULTS.md.

Run on the chip:
    python scripts/soak_flagship_multistep.py [epochs] [steps_per_dispatch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    spd = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from multimodal_similarity_tpu.configs import TrainConfig
    from multimodal_similarity_tpu.data import generate_synthetic_honda
    from multimodal_similarity_tpu.train.trainers import multimodal_model

    root = "/tmp/soak_mm_spd_ds_v1"
    if not os.path.exists(os.path.join(root, "features")):
        generate_synthetic_honda(
            root, n_sessions=12, frames_per_session=400,
            modal_dims={"resnet": (8, 8, 96), "sensors": (8,),
                        "segment": (16,)},
            class_scale=1.0, noise_scale=2.2, seed=11, splits=(0.85, 0.14))

    cfg = TrainConfig(
        DATA_ROOT=root, name="mm_spd_soak", network="convrtsn",
        feat=["resnet", "sensors", "segment"], n_h=8, n_w=8, n_C=96,
        emb_dim=128, num_seg=3, sess_per_batch=3, max_epochs=epochs,
        static_epochs=max(epochs // 2, 1), triplet_per_batch=100,
        learning_rate=0.01, keep_prob=0.9, lambda_multimodal=0.5,
        multimodal_epochs=0, label_num=8, silent_mode=True,
        device_cache=True, steps_per_dispatch=spd).resolve()
    cfg.feat_dim["segment"] = (16,)

    t0 = time.time()
    state, metrics, rd = multimodal_model.train(
        cfg, device_mining=True, event_budget=160,
        result_dir="/tmp/mm_spd_soak")
    wall = time.time() - t0
    recs = [json.loads(l) for l in open(rd + "/metrics.jsonl")]
    vals = [r["val_mAP"] for r in recs if "val_mAP" in r]
    steps = sum(1 for r in recs if "loss" in r)
    print(json.dumps({
        "soak": "flagship_cached_multistep", "epochs": epochs,
        "steps_per_dispatch": spd, "steps": steps,
        "wall_s": round(wall, 1),
        "val_mAP_first": round(vals[0], 4),
        "val_mAP_last": round(vals[-1], 4),
        "final_metrics": {k: round(float(v), 4)
                          for k, v in metrics.items()}}))


if __name__ == "__main__":
    main()
