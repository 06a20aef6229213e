#!/bin/bash
# Flagship semi-supervised multimodal run (reference
# scripts/train_multimodal_model.sh); requires pretrained PDDM branch
# checkpoints from train_pddm.sh
source "$(dirname "$0")/_common.sh"
SENSORS_PATH=${SENSORS_PATH:?set SENSORS_PATH to the PDDM sensors ckpt}
SEGMENT_PATH=${SEGMENT_PATH:?set SEGMENT_PATH to the PDDM segment ckpt}
$PY $PKG.train.trainers.multimodal_model --DATA_ROOT $DATA_ROOT \
    --name multimodal_full --feat resnet,sensors,segment \
    --network convrtsn --lambda_multimodal 0.1 --multimodal_epochs 0 \
    --event_per_batch 1000 --sess_per_batch 3 --num_negative 5 \
    --num_seg 3 --batch_size 512 --triplet_per_batch 200 \
    --label_num 9 --max_epochs 2000 --static_epochs 1000 \
    --learning_rate 1e-2 --keep_prob 0.5 --lambda_l2 0.0 --alpha 0.2 \
    --emb_dim 128 --optimizer ADAM --multimodal_select random \
    --sensors_path $SENSORS_PATH --segment_path $SEGMENT_PATH --no_joint "$@"
