"""Package CLI: list and dispatch the experiment/eval entrypoints.

    python -m multimodal_similarity_tpu                  # list commands
    python -m multimodal_similarity_tpu train.base_model --DATA_ROOT ...
    python -m multimodal_similarity_tpu eval.evaluate_model --model_path ...
"""

from __future__ import annotations

import importlib
import sys

TRAINERS = [
    "base_model", "base_model_tf", "base_model_batchhard",
    "base_model_lifted", "base_model_classifier", "multitask_model",
    "pairsim_model", "pddm_model", "multimodal_model",
    "multimodal_model_hardonly", "multimodal_model_weak",
    "modality_hallucination", "modality_hallucination_weak",
    "multitask_dcca", "multitask_cross_prediction", "cross_prediction",
    "unimodal_pretrain_sae", "unimodal_pretrain_cluster",
    "unimodal_pretrain_pairsim", "base_model_CUB", "base_CUB", "pddm_CUB",
    "debug_CUB",
]
EVALS = [
    "evaluate_model", "evaluate_baseline", "evaluate_late_fusion",
    "evaluate_hallucination", "evaluate_pairsim", "check_inconsistent",
    "analysis", "export_index",
]
PREPROCESS = ["frames", "features", "annotations", "sensors",
              "segmentation"]
TOOLS = ["import_tf1"]


def _usage() -> None:
    print(__doc__)
    print("trainers (train.<name>):")
    for t in TRAINERS:
        print(f"  {t}")
    print("evaluation (eval.<name>):")
    for e in EVALS:
        print(f"  {e}")
    print("preprocessing (preprocess.<name>):")
    for p in PREPROCESS:
        print(f"  {p}")
    print("tools (tools.<name>):")
    for t in TOOLS:
        print(f"  {t}")


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        _usage()
        return 0
    cmd = argv[0]
    group, _, name = cmd.partition(".")
    module_map = {
        "train": ("multimodal_similarity_tpu.train.trainers.", TRAINERS),
        "eval": ("multimodal_similarity_tpu.eval.", EVALS),
        "preprocess": ("multimodal_similarity_tpu.preprocess.", PREPROCESS),
        "tools": ("multimodal_similarity_tpu.tools.", TOOLS),
    }
    if group not in module_map or name not in module_map[group][1]:
        print(f"unknown command: {cmd}\n")
        _usage()
        return 2
    module = importlib.import_module(module_map[group][0] + name)
    module.main(argv[1:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
