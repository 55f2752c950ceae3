#!/usr/bin/env bash
# Database construction launcher (equivalent of reference/build_lmdb.sh).
set -euo pipefail

IMAGE_FOLDER="data/images"
CSV_FOLDER="data/csvs"
OUTPUT_FOLDER="data/db"
DATASET_NAME="mydata"
TRAIN_FRACTION=0.8
IMAGE_FORMAT="tif"

cd "$(dirname "$0")/.."

python -m yolov3_tpu.data.builder \
  --image_folder "${IMAGE_FOLDER}" \
  --csv_folder "${CSV_FOLDER}" \
  --output_folder "${OUTPUT_FOLDER}" \
  --dataset_name "${DATASET_NAME}" \
  --train_fraction "${TRAIN_FRACTION}" \
  --image_format "${IMAGE_FORMAT}"
