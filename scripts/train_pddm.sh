#!/bin/bash
# PDDM similarity nets on auxiliary modalities (reference scripts/train_pddm.sh)
source "$(dirname "$0")/_common.sh"
$PY $PKG.train.trainers.pddm_model --DATA_ROOT $DATA_ROOT \
    --name PDDM_sensors --feat sensors --network rtsn --n_input 8 \
    --emb_dim 32 --triplet_select facenet --label_num 9 \
    --max_epochs 1500 --static_epochs 750 --learning_rate 1e-2 \
    --triplet_per_batch 200 --sess_per_batch 3 --optimizer ADAM "$@"
$PY $PKG.train.trainers.pddm_model --DATA_ROOT $DATA_ROOT \
    --name PDDM_segment --feat segment --network rtsn --n_input 357 \
    --emb_dim 32 --triplet_select facenet --label_num 9 \
    --max_epochs 1500 --static_epochs 750 --learning_rate 1e-2 \
    --triplet_per_batch 200 --sess_per_batch 3 --optimizer ADAM "$@"
