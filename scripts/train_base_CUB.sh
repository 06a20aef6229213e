#!/bin/bash
# CUB feature-level triplet retrieval (reference scripts/train_base_CUB.sh)
source "$(dirname "$0")/_common.sh"
CUB_ROOT=${CUB_ROOT:-/mnt/work/CUB_200_2011/data}
$PY $PKG.train.trainers.base_model_CUB --DATA_ROOT $CUB_ROOT \
    --name base_CUB --emb_dim 64 --batch_size 64 --max_epochs 5000 \
    --static_epochs 2500 --learning_rate 1e-3 --alpha 0.2 \
    --triplet_per_batch 64 --optimizer ADAM "$@"
