#!/bin/bash
# End-to-end CUB with backbone + contrib losses (reference scripts/CUB_tensorflow.sh)
source "$(dirname "$0")/_common.sh"
CUB_ROOT=${CUB_ROOT:-/mnt/work/CUB_200_2011/data}
$PY $PKG.train.trainers.base_CUB --DATA_ROOT $CUB_ROOT \
    --name cub_e2e --loss triplet --emb_dim 64 --batch_size 32 \
    --max_epochs 5000 --learning_rate 1e-3 --optimizer ADAM "$@"
