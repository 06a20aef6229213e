"""Trainer-surface throughput A/B: synchronous vs deferred step-metrics
readback (--log_flush_every).

Every loop trainer used to float() the step's loss before dispatching
the next step.  On a co-located host that readback costs microseconds;
on a remote-coordinator / tunneled link it serializes dispatch — one
link RTT per step ON TOP of compute, which caps the trainer loop far
below what bench.py measures for the same step (bench loops only sync
at the end).  This runs the SAME cached batch-hard training — identical
data, config, seed — at --log_flush_every 1 (the old synchronous
behavior) and 32 (the default), on the real chip, and reports the
trainer-surface events/s of each.

The win scales with RTT/step_time: at heavy per-step compute (full
8x8x96 video dims) the readback hides behind the step and the gain is
small; at light steps (sensors dims, where the step is ~ms) the RTT IS
the step time and deferral approaches the pipeline-depth bound.  Both
operating points are real: the reference's sensor/segment trainers are
light-step.

Run on the chip:
    python scripts/ab_deferred_logging.py [epochs] [light|heavy]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mode = sys.argv[2] if len(sys.argv) > 2 else "light"

    from multimodal_similarity_tpu.configs import TrainConfig
    from multimodal_similarity_tpu.data import generate_synthetic_honda
    from multimodal_similarity_tpu.train.trainers import base_model_batchhard

    n_sessions = 12 if mode == "heavy" else 36
    root = f"/tmp/ab_deferred_ds_{mode}_v1"
    if not os.path.exists(os.path.join(root, "features")):
        generate_synthetic_honda(
            root, n_sessions=n_sessions, frames_per_session=400,
            modal_dims={"resnet": (8, 8, 96), "sensors": (8,),
                        "segment": (16,)},
            class_scale=1.0, noise_scale=1.0, seed=3, splits=(0.9, 0.09))

    if mode == "heavy":
        model_kw = dict(feat="resnet", network="convrtsn",
                        n_h=8, n_w=8, n_C=96)
    else:
        model_kw = dict(feat="sensors", network="rtsn", n_input=8)

    results = {}
    for flush_every in (1, 32):
        cfg = TrainConfig(
            DATA_ROOT=root, emb_dim=128, num_seg=3, batch_size=64,
            max_epochs=epochs, static_epochs=max(epochs // 2, 1),
            device_cache=True, log_flush_every=flush_every,
            silent_mode=True, seed=7, **model_kw).resolve()
        t0 = time.time()
        state, metrics, rd = base_model_batchhard.train(
            cfg, event_budget=160,
            result_dir=f"/tmp/ab_deferred_{mode}_{flush_every}")
        wall = time.time() - t0
        # steady state from the metrics stream: validation records are
        # flush-synced epoch boundaries, so (last val time - first val
        # time) brackets epochs 2..N of real work and EXCLUDES the
        # one-time cache build and the first-step compile
        recs = [json.loads(l) for l in open(rd + "/metrics.jsonl")]
        steps = sum(1 for r in recs if "loss" in r)
        vals = [r for r in recs if "val_mAP" in r]
        if len(vals) < 2:
            raise SystemExit("need >= 2 epochs: the steady bracket spans "
                             "validation records (epoch boundaries)")
        span = vals[-1]["time"] - vals[0]["time"]
        span_steps = vals[-1]["step"] - vals[0]["step"]
        results[flush_every] = {
            "wall_s": round(wall, 2),
            "steps": steps,
            "steady_events_per_sec": round(span_steps * 64 / span, 1),
            "final_val_mAP": round(float(metrics["val_mAP"]), 4),
        }
        print(f"log_flush_every={flush_every}: {json.dumps(results[flush_every])}")

    speedup = (results[32]["steady_events_per_sec"]
               / max(results[1]["steady_events_per_sec"], 1e-9))
    print(json.dumps({"ab": "deferred_logging", "mode": mode,
                      "epochs": epochs,
                      "sync": results[1], "deferred": results[32],
                      "trainer_surface_speedup": round(speedup, 3)}))


if __name__ == "__main__":
    main()
