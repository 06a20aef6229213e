#!/bin/bash
# Late-fusion evaluation (reference scripts/evaluate_latefusion.sh)
source "$(dirname "$0")/_common.sh"
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH}
SENSORS_PATH=${SENSORS_PATH:?set SENSORS_PATH}
$PY $PKG.eval.evaluate_late_fusion --DATA_ROOT $DATA_ROOT \
    --model_path $MODEL_PATH --sensors_path $SENSORS_PATH \
    --network convrtsn --feat resnet,sensors --emb_dim 128 "$@"
