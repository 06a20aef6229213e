"""On-chip InceptionResNetV2 feature-extraction throughput.

Measures frames/s to the Conv2d_7b_1x1 endpoint at 299x299 — the rate
bound for running the reference's offline CNN feature step
(preprocess/feat_extract_ResNetV2.py:10-72) on the TPU itself instead of
shipping precomputed features over the host link.  Recorded in
RESULTS.md "feature extraction on chip".

Usage: python scripts/bench_feature_tower.py [batches...]
"""
import os
import sys
import time

import numpy as np

# runnable as `python scripts/bench_feature_tower.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batches=(8, 32, 64)):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multimodal_similarity_tpu.models.inception_resnet_v2 import (
        InceptionResNetV2)

    print(f"backend {jax.default_backend()}", file=sys.stderr, flush=True)
    model = InceptionResNetV2()
    x_init = jnp.asarray(
        np.random.RandomState(0).randn(2, 299, 299, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x_init)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def run(batch, dtype, reps=8, rounds=3):
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, 299, 299, 3),
                              jnp.float32).astype(dtype)
        p = jax.tree.map(lambda a: a.astype(dtype), params)
        bs = jax.tree.map(lambda a: a.astype(dtype), batch_stats)

        @jax.jit
        def fwd(p, bs, x):
            out = model.apply({"params": p, "batch_stats": bs}, x)
            return jnp.sum(out.astype(jnp.float32))

        float(fwd(p, bs, x))  # compile + sync (scalar readback, see bench.py)
        best = 0.0
        for _ in range(rounds):
            t0 = time.time()
            out = None
            for _ in range(reps):
                out = fwd(p, bs, x)
            float(out)
            best = max(best, batch * reps / (time.time() - t0))
        return best

    for batch in batches:
        for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            fps = run(batch, dtype)
            print(f"batch={batch:3d} {name}: {fps:8.1f} frames/s "
                  f"({fps / 3:7.1f} events/s at 3 TSN segments)", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(tuple(args) if args else (8, 32, 64))
