#!/bin/bash
# Unimodal triplet baseline (reference scripts/train_base_model.sh)
source "$(dirname "$0")/_common.sh"
$PY $PKG.train.trainers.base_model --DATA_ROOT $DATA_ROOT \
    --name base_convrtsn --feat resnet --network convrtsn \
    --triplet_select facenet --metric squaredeuclidean \
    --event_per_batch 1000 --sess_per_batch 3 --num_negative 5 \
    --num_seg 3 --batch_size 512 --triplet_per_batch 200 \
    --label_num 93 --max_epochs 2000 --static_epochs 1000 \
    --learning_rate 1e-2 --keep_prob 0.5 --lambda_l2 0.0 \
    --alpha 0.2 --emb_dim 128 --optimizer ADAM "$@"
