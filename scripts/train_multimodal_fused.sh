#!/bin/bash
# TPU-first flagship run: the fully-fused multimodal step (--device_mining
# compiles labeled mining, both PDDM all-pairs passes, hard+structure
# mining, and all three losses into ONE device program per batch) with
# the device-resident int8 epoch cache (--device_cache: the train set
# uploads ONCE; epochs >= 2 re-sample TSN segments on device and the
# link carries only KB-scale index plans) and multi-step dispatch
# (--steps_per_dispatch 8: eight optimizer steps per program — RESULTS.md
# "Multi-step dispatch").  When the int8 train set exceeds
# --device_cache_gb the cache falls back to streaming, where
# --int8_features still quarters the wire bytes.  Same semantics as
# train_multimodal_model.sh; acceptance is retrieval-metric parity (see
# PARITY.md / RESULTS.md).
source "$(dirname "$0")/_common.sh"
SENSORS_PATH=${SENSORS_PATH:-}
SEGMENT_PATH=${SEGMENT_PATH:-}
EXTRA=""
[ -n "$SENSORS_PATH" ] && EXTRA="$EXTRA --sensors_path $SENSORS_PATH"
[ -n "$SEGMENT_PATH" ] && EXTRA="$EXTRA --segment_path $SEGMENT_PATH"
$PY $PKG.train.trainers.multimodal_model --DATA_ROOT $DATA_ROOT \
    --name multimodal_fused --feat resnet,sensors,segment \
    --network convrtsn --lambda_multimodal 0.1 --multimodal_epochs 0 \
    --event_per_batch 1000 --sess_per_batch 3 --num_negative 5 \
    --num_seg 3 --batch_size 512 --triplet_per_batch 200 \
    --label_num 9 --max_epochs 2000 --static_epochs 1000 \
    --learning_rate 1e-2 --keep_prob 0.5 --lambda_l2 0.0 --alpha 0.2 \
    --emb_dim 128 --optimizer ADAM --multimodal_select random \
    --device_mining --int8_features --device_cache \
    --steps_per_dispatch 8 $EXTRA "$@"
