#!/bin/bash
# Standalone PairSim classifier (reference scripts/train_pairsim_model.sh)
source "$(dirname "$0")/_common.sh"
$PY $PKG.train.trainers.pairsim_model --DATA_ROOT $DATA_ROOT \
    --name pairsim --feat sensors --network rtsn --n_input 8 \
    --emb_dim 128 --batch_size 128 --num_negative 1 \
    --max_epochs 1000 --static_epochs 500 --learning_rate 1e-2 \
    --negative_epochs 0 --optimizer ADAM "$@"
