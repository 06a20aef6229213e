#!/bin/bash
# PDDM on CUB attributes (reference scripts/CUB_pddm.sh)
source "$(dirname "$0")/_common.sh"
CUB_ROOT=${CUB_ROOT:-/mnt/work/CUB_200_2011/data}
$PY $PKG.train.trainers.pddm_CUB --DATA_ROOT $CUB_ROOT \
    --name cub_pddm --emb_dim 64 --batch_size 64 --max_epochs 3000 \
    --learning_rate 1e-3 --optimizer ADAM "$@"
