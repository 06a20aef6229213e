#!/bin/bash
# PDDM inconsistency check (reference scripts/evaluate_pddm.sh)
source "$(dirname "$0")/_common.sh"
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH}
$PY $PKG.eval.check_inconsistent --head pddm --DATA_ROOT $DATA_ROOT \
    --model_path $MODEL_PATH --network rtsn --feat sensors \
    --n_input 8 --emb_dim 32 "$@"
