#!/bin/bash
# Unsupervised pretrain chain: seq2seq AE -> k-means -> PairSim
# (reference scripts/unimodal_pretrain.sh)
source "$(dirname "$0")/_common.sh"
MODE=${MODE:-sae}
case $MODE in
  sae)
    $PY $PKG.train.trainers.unimodal_pretrain_sae --DATA_ROOT $DATA_ROOT \
        --name pretrain_sae --feat sensors --network rtsn --n_input 8 \
        --emb_dim 128 --max_epochs 500 --static_epochs 250 \
        --learning_rate 1e-2 --optimizer ADAM "$@" ;;
  cluster)
    $PY $PKG.train.trainers.unimodal_pretrain_cluster --DATA_ROOT $DATA_ROOT \
        --feat sensors --emb_dim 128 --model_path ${MODEL_PATH:?set MODEL_PATH} "$@" ;;
  pairsim)
    $PY $PKG.train.trainers.unimodal_pretrain_pairsim --DATA_ROOT $DATA_ROOT \
        --name pretrain_pairsim --emb_dim 128 --max_epochs 200 \
        --model_path ${MODEL_PATH:?set MODEL_PATH} "$@" ;;
esac
