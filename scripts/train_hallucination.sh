#!/bin/bash
# Modality hallucination (reference scripts/train_hallucination.sh)
source "$(dirname "$0")/_common.sh"
$PY $PKG.train.trainers.modality_hallucination --DATA_ROOT $DATA_ROOT \
    --name hallucination --feat resnet,sensors,segment --network convrtsn \
    --lambda_multimodal 0.1 --triplet_select facenet \
    --triplet_per_batch 200 --sess_per_batch 3 --label_num 93 \
    --max_epochs 2000 --static_epochs 1000 --learning_rate 1e-2 \
    --keep_prob 0.5 --emb_dim 128 --optimizer ADAM "$@"
