#!/bin/bash
# Checkpoint retrieval evaluation (reference scripts/evaluate.sh)
source "$(dirname "$0")/_common.sh"
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH to a checkpoint}
$PY $PKG.eval.evaluate_model --DATA_ROOT $DATA_ROOT \
    --model_path $MODEL_PATH --network convrtsn --feat resnet \
    --emb_dim 128 "$@"
