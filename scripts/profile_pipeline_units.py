"""Profile per-unit FLOPs of the InceptionResNetV2 trunk at 299x299.

One-time helper for parallel/pipeline.py: compiles each of the trunk's
44 units as its own XLA program and reads the compiler's flops estimate
(static shapes make it exact for this input size).  The output feeds
INCEPTION_RESNET_V2_UNIT_COSTS so PipelinedBackbone's default stage
split balances stage compute, not just unit count.

    JAX_PLATFORMS=cpu python scripts/profile_pipeline_units.py [size]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 299

    from multimodal_similarity_tpu.models.inception_resnet_v2 import (
        N_PIPELINE_UNITS, InceptionResNetV2)
    from multimodal_similarity_tpu.parallel.pipeline import (
        profile_unit_costs)

    costs = profile_unit_costs(InceptionResNetV2(), N_PIPELINE_UNITS,
                               (size, size, 3))
    rel = [c / costs[0] for c in costs]
    total = sum(costs)
    print(f"# input {size}x{size}, total {total / 1e9:.2f} GFLOP/frame")
    for i, (c, r) in enumerate(zip(costs, rel)):
        print(f"unit {i:2d}: {c / 1e9:8.3f} GFLOP  ({100 * c / total:5.2f}%"
              f", {r:.3f}x stem)")
    print(json.dumps({"size": size, "relative_to_stem":
                      [round(r, 4) for r in rel]}))


if __name__ == "__main__":
    main()
