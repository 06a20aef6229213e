#!/bin/bash
# Softmax classification baseline (reference scripts/train_base_classifier.sh)
source "$(dirname "$0")/_common.sh"
$PY $PKG.train.trainers.base_model_classifier --DATA_ROOT $DATA_ROOT \
    --name classifier --feat resnet --network convtsn \
    --sess_per_batch 3 --max_epochs 1000 --static_epochs 500 \
    --learning_rate 1e-2 --keep_prob 0.5 --emb_dim 256 --optimizer ADAM "$@"
