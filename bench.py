"""Benchmark: flagship ConvRTSN embedding throughput + fused train-step
throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against a fixed host-measured reference implementation cost model —
here: the reference's three-hop host round trip (embed-all on device, mine
on host CPU, re-forward) measured in this same process, so the ratio
reflects the fused-step speedup on identical hardware.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.ops.distances import cdist, all_diffs
    from multimodal_similarity_tpu.ops.mining import select_triplets_facenet
    from multimodal_similarity_tpu.train.state import TrainState, build_optimizer
    from multimodal_similarity_tpu.train.steps import (
        make_embed_fn, make_triplet_train_step, l2_normalize)

    rng = np.random.RandomState(0)
    n_events, n_seg = 512, 3
    shape = (n_events, n_seg, 8, 8, 1536)
    labels_np = rng.randint(0, 7, size=n_events).astype(np.int32)

    model = build_encoder("convrtsn", num_seg=n_seg, emb_dim=256,
                          n_input=1536, n_h=8, n_w=8, n_C=20, keep_prob=0.9)

    x_np = rng.randn(*shape).astype(np.float32)
    x = jnp.asarray(x_np)
    variables = model.init(jax.random.PRNGKey(0), x[:2])
    state = TrainState.create(variables["params"],
                              build_optimizer("ADAM", 0.01))

    embed = make_embed_fn(model, normalized=True)
    emb = embed(state.params, x)
    jax.block_until_ready(emb)

    # --- embedding throughput -------------------------------------------
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        emb = embed(state.params, x)
    jax.block_until_ready(emb)
    embed_eps = n_events * reps / (time.time() - t0)

    # --- fused train step (embed + on-device mine + re-forward + grad) ---
    step = make_triplet_train_step(model, triplet_per_batch=100, alpha=0.2)
    labels = jnp.asarray(labels_np)
    mask = jnp.ones(n_events, jnp.float32)
    key = jax.random.PRNGKey(1)
    lr = jnp.float32(0.01)
    state, aux = step(state, x, labels, mask, key, lr)  # compile
    jax.block_until_ready(aux["loss"])
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        state, aux = step(state, x, labels, mask, key, lr)
    jax.block_until_ready(aux["loss"])
    fused_eps = n_events * reps / (time.time() - t0)

    # --- reference-style step: device embed, HOST mine, device re-forward -
    t0 = time.time()
    reps_ref = 2
    for _ in range(reps_ref):
        emb_host = np.asarray(embed(state.params, x))
        dists = cdist(all_diffs(emb_host, emb_host))
        idx, _ = select_triplets_facenet(labels_np, np.asarray(dists), 100)
        tri = jnp.asarray(x_np[np.asarray(idx, np.int64)]) if idx else x[:300]
        e2 = embed(state.params, tri)
        jax.block_until_ready(e2)
    ref_eps = n_events * reps_ref / (time.time() - t0)

    result = {
        "metric": "fused_train_step_events_per_sec",
        "value": round(fused_eps, 2),
        "unit": "events/s/chip",
        "vs_baseline": round(fused_eps / ref_eps, 3),
        "detail": {
            "embed_events_per_sec": round(embed_eps, 2),
            "reference_style_step_events_per_sec": round(ref_eps, 2),
            "n_events": n_events,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
