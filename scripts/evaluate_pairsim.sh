#!/bin/bash
# PairSim verification accuracy (reference scripts/evaluate_pairsim.sh)
source "$(dirname "$0")/_common.sh"
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH}
$PY $PKG.eval.evaluate_pairsim --DATA_ROOT $DATA_ROOT \
    --model_path $MODEL_PATH --network rtsn --feat sensors \
    --n_input 8 --emb_dim 128 --no_normalized "$@"
