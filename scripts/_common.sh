#!/bin/bash
# Shared settings for the experiment scripts (reference scripts/ parity).
# Set DATA_ROOT to your dataset directory before running.
DATA_ROOT=${DATA_ROOT:-/mnt/work/honda_100h}
PY="python -m"
PKG=multimodal_similarity_tpu
