#!/bin/bash
# Triplet + cross-modal MSE multitask (reference scripts/train_multitask_crosspredict.sh)
source "$(dirname "$0")/_common.sh"
SENSORS_PATH=${SENSORS_PATH:?set SENSORS_PATH}
SEGMENT_PATH=${SEGMENT_PATH:?set SEGMENT_PATH}
$PY $PKG.train.trainers.multitask_cross_prediction --DATA_ROOT $DATA_ROOT \
    --name multitask_crosspredict --feat resnet,sensors,segment \
    --network convrtsn --lambda_multimodal 0.1 --multimodal_epochs 0 \
    --label_num 9 --triplet_per_batch 200 --sess_per_batch 3 \
    --max_epochs 2000 --static_epochs 1000 --learning_rate 1e-2 \
    --keep_prob 0.5 --emb_dim 128 --optimizer ADAM \
    --sensors_path $SENSORS_PATH --segment_path $SEGMENT_PATH "$@"
