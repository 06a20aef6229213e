"""Dispatch-loop microbench: K=1 fused cached steps vs lax.scan windows.

Isolates what --steps_per_dispatch actually changes — the dispatch loop
— from the trainer-surface costs (per-epoch validation, checkpointing)
that dominated the end-to-end A/B at small epochs.  Times N optimizer
steps over the device cache three ways, blocking only on the final
state: per-step dispatch, K=8 windows, K=32 windows.

Run on the chip:
    python scripts/bench_multistep.py [n_steps] [batch_size]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_similarity_tpu.configs import TrainConfig
    from multimodal_similarity_tpu.data import generate_synthetic_honda
    from multimodal_similarity_tpu.data.datasets import prepare_dataset
    from multimodal_similarity_tpu.data.device_cache import (
        DeviceFeatureCache)
    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.ops.mining import select_batch_balanced
    from multimodal_similarity_tpu.train.state import (
        TrainState, build_optimizer)
    from multimodal_similarity_tpu.train.trainers.base_model_batchhard \
        import make_balanced_batch_step

    root = "/tmp/ab_deferred_ds_light_v1"
    if not os.path.exists(os.path.join(root, "features")):
        generate_synthetic_honda(
            root, n_sessions=36, frames_per_session=400,
            modal_dims={"resnet": (8, 8, 96), "sensors": (8,),
                        "segment": (16,)},
            class_scale=1.0, noise_scale=1.0, seed=3, splits=(0.9, 0.09))

    cfg = TrainConfig(DATA_ROOT=root, feat="sensors", network="rtsn",
                      n_input=8, emb_dim=128, num_seg=3,
                      device_cache=True, silent_mode=True).resolve()
    dataset = prepare_dataset(cfg.feature_root, cfg.train_session,
                              "sensors", cfg.label_root, "goal")
    cache = DeviceFeatureCache.build(dataset, n_seg=3, sess_per_batch=3,
                                     event_budget=160, seed=7)
    model = build_encoder("rtsn", num_seg=3, emb_dim=128, n_input=8,
                          keep_prob=0.9)
    params0 = jax.tree.map(
        np.array, model.init(jax.random.PRNGKey(0),
                             jnp.zeros((2, 3, 8)))["params"])
    # ONE optimizer for every state: TrainState.tx is a STATIC (non-pytree)
    # jit field, so a freshly built optax transformation per run is a new
    # static key — the timed run would silently RECOMPILE the whole
    # program (this exact bug made an earlier version of this bench read
    # ~41 ms/step for every variant: it was timing the compiler)
    tx = build_optimizer("ADAM", 0.01)

    def fresh_state():
        # donated steps consume their input state: every timed run needs
        # its own device copy
        return TrainState.create(jax.tree.map(jnp.asarray, params0), tx)

    ops = cache.step_operands()

    # one fixed pool of valid (packed, rows, labels) batches
    import random as _random
    sel = _random.Random(5)
    pool = []
    while len(pool) < n_steps:
        for plan in cache.epoch_plans():
            valid = np.where(plan["mask_host"] > 0)[0]
            idx = select_batch_balanced(plan["labels_host"][valid], batch,
                                        rng=sel)
            if idx.size:
                rows = valid[idx].astype(np.int32)
                pool.append((plan["packed"], rows,
                             plan["labels_host"][rows]))
            if len(pool) >= n_steps:
                break
    keys = [jax.random.PRNGKey(i) for i in range(n_steps)]

    single = make_balanced_batch_step(model, cfg, "batchhard", cache=cache)
    out = {}

    def run_singles():
        st = fresh_state()
        for (packed, rows, labels), key in zip(pool, keys):
            st, aux = single(st, packed, jnp.asarray(rows),
                             jnp.asarray(labels), key, jnp.float32(0.01),
                             *ops)
        jax.block_until_ready(st.params)
        return st

    run_singles()  # compile
    t0 = time.time()
    run_singles()
    dt = time.time() - t0
    out["k1"] = {"steps_per_sec": round(n_steps / dt, 1),
                 "events_per_sec": round(n_steps * batch / dt, 1)}
    print("k1", json.dumps(out["k1"]))

    for K in (8, 32):
        if n_steps % K:
            continue
        multi = make_balanced_batch_step(model, cfg, "batchhard",
                                         cache=cache, steps_per_dispatch=K)

        def run_windows():
            st = fresh_state()
            for s in range(0, n_steps, K):
                win = pool[s:s + K]
                st, auxs = multi(
                    st, np.stack([w[0] for w in win]),
                    np.stack([w[1] for w in win]),
                    np.stack([w[2] for w in win]),
                    jnp.stack(keys[s:s + K]), jnp.float32(0.01), *ops)
            jax.block_until_ready(st.params)
            return st

        run_windows()  # compile
        t0 = time.time()
        run_windows()
        dt = time.time() - t0
        out[f"k{K}"] = {"steps_per_sec": round(n_steps / dt, 1),
                        "events_per_sec": round(n_steps * batch / dt, 1)}
        print(f"k{K}", json.dumps(out[f"k{K}"]))

    top = max((k for k in out if k.startswith("k")),
              key=lambda k: int(k[1:]))
    out[f"speedup_{top}_vs_k1"] = round(
        out[top]["steps_per_sec"] / out["k1"]["steps_per_sec"], 3)
    print(json.dumps({"bench": "multistep_dispatch", "n_steps": n_steps,
                      "batch": batch, **out}))


if __name__ == "__main__":
    main()
