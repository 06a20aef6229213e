#!/bin/bash
# Pure cross-modal regression (reference scripts/train_cross_prediction.sh)
source "$(dirname "$0")/_common.sh"
$PY $PKG.train.trainers.cross_prediction --DATA_ROOT $DATA_ROOT \
    --name cross_prediction --feat resnet,sensors --network convrtsn \
    --sess_per_batch 3 --max_epochs 1000 --static_epochs 500 \
    --learning_rate 1e-2 --keep_prob 0.5 --emb_dim 128 --optimizer ADAM "$@"
