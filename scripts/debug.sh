#!/bin/bash
# Small smoke-run config (reference scripts/debug.sh, documentation.txt:45-49)
source "$(dirname "$0")/_common.sh"
$PY $PKG.train.trainers.base_model --DATA_ROOT $DATA_ROOT \
    --name debug --feat sensors --network rtsn --n_input 8 \
    --triplet_select facenet --label_num 9 --sess_per_batch 2 \
    --max_epochs 2 --triplet_per_batch 50 --emb_dim 32 \
    --learning_rate 1e-2 "$@"
