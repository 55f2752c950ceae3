#!/usr/bin/env bash
# Training launcher (equivalent of reference/train.sh): configure by editing
# the variables below. Chip selection: the trainer uses every visible TPU
# chip; restrict with NUM_DEVICES (the reference selects GPUs via
# CUDA_VISIBLE_DEVICES).
set -euo pipefail

# ---- configuration ----------------------------------------------------------
TRAIN_DATABASE="data/db/train-mydata.ydb"
TEST_DATABASE="data/db/test-mydata.ydb"
OUTPUT_DIR="results"
BATCH_SIZE=8                 # per chip
LEARNING_RATE=1e-4
TEST_EVERY_N_STEPS=1000
EARLY_STOPPING=10
USE_AUGMENTATION=1
ANCHORS="64x384,384x64"
NUM_DEVICES=""               # empty = all chips
# ------------------------------------------------------------------------------

cd "$(dirname "$0")/.."

EXTRA=()
if [[ -n "${NUM_DEVICES}" ]]; then
  EXTRA+=(--num_devices "${NUM_DEVICES}")
fi

python -m yolov3_tpu.train \
  --train_database "${TRAIN_DATABASE}" \
  --test_database "${TEST_DATABASE}" \
  --output_dir "${OUTPUT_DIR}" \
  --batch_size "${BATCH_SIZE}" \
  --learning_rate "${LEARNING_RATE}" \
  --test_every_n_steps "${TEST_EVERY_N_STEPS}" \
  --early_stopping "${EARLY_STOPPING}" \
  --use_augmentation "${USE_AUGMENTATION}" \
  --anchors "${ANCHORS}" \
  "${EXTRA[@]}"
