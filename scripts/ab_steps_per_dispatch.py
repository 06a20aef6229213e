"""Trainer-surface throughput vs --steps_per_dispatch (real chip).

RESULTS.md's deferred-logging study found the governing per-step cost on
a high-latency link is the dispatch RPC itself — readback deferral can't
remove it, only amortization can.  --steps_per_dispatch K scans K whole
optimizer steps into ONE program over the device cache, so the link pays
one dispatch (plus one stacked KB-scale plan upload) per K steps.  This
runs identical cached batch-hard training at K in (1, 4, 16) and reports
the steady-state trainer-surface rate for each (flush-synced epoch
boundary bracket, excluding the one-time cache build + compile).

Run on the chip:
    python scripts/ab_steps_per_dispatch.py [epochs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from multimodal_similarity_tpu.configs import TrainConfig
    from multimodal_similarity_tpu.data import generate_synthetic_honda
    from multimodal_similarity_tpu.train.trainers import base_model_batchhard

    root = "/tmp/ab_deferred_ds_light_v1"
    if not os.path.exists(os.path.join(root, "features")):
        generate_synthetic_honda(
            root, n_sessions=36, frames_per_session=400,
            modal_dims={"resnet": (8, 8, 96), "sensors": (8,),
                        "segment": (16,)},
            class_scale=1.0, noise_scale=1.0, seed=3, splits=(0.9, 0.09))

    results = {}
    for k in (1, 4, 16):
        cfg = TrainConfig(
            DATA_ROOT=root, feat="sensors", network="rtsn", n_input=8,
            emb_dim=128, num_seg=3, batch_size=64,
            max_epochs=epochs, static_epochs=max(epochs // 2, 1),
            device_cache=True, steps_per_dispatch=k,
            silent_mode=True, seed=7).resolve()
        t0 = time.time()
        state, metrics, rd = base_model_batchhard.train(
            cfg, event_budget=160, result_dir=f"/tmp/ab_spd_{k}")
        wall = time.time() - t0
        recs = [json.loads(l) for l in open(rd + "/metrics.jsonl")]
        steps = sum(1 for r in recs if "loss" in r)
        vals = [r for r in recs if "val_mAP" in r]
        if len(vals) < 2:
            raise SystemExit("need >= 2 epochs: the steady bracket spans "
                             "validation records (epoch boundaries)")
        span = vals[-1]["time"] - vals[0]["time"]
        span_steps = vals[-1]["step"] - vals[0]["step"]
        results[k] = {
            "wall_s": round(wall, 2),
            "steps": steps,
            "steady_events_per_sec": round(span_steps * 64 / span, 1),
            "final_val_mAP": round(float(metrics["val_mAP"]), 4),
        }
        print(f"steps_per_dispatch={k}: {json.dumps(results[k])}")

    print(json.dumps({
        "ab": "steps_per_dispatch", "epochs": epochs,
        "rows": results,
        "speedup_16_vs_1": round(
            results[16]["steady_events_per_sec"]
            / max(results[1]["steady_events_per_sec"], 1e-9), 3)}))


if __name__ == "__main__":
    main()
