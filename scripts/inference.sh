#!/usr/bin/env bash
# Inference launcher (equivalent of reference/inference.sh).
set -euo pipefail

SAVED_MODEL="results/saved_model"
IMAGE_FOLDER="data/test_images"
IMAGE_FORMAT="tif"
OUTPUT_FOLDER="results/detections"
MIN_BOX_SIZE=32
TILED=0                       # 1 = ghost-zone tiled inference
TILE_HEIGHT=512
TILE_WIDTH=512

cd "$(dirname "$0")/.."

if [[ "${TILED}" == "1" ]]; then
  python -m yolov3_tpu.inference_tiled \
    --saved-model-filepath "${SAVED_MODEL}" \
    --image-folder "${IMAGE_FOLDER}" \
    --image-format "${IMAGE_FORMAT}" \
    --output-folder "${OUTPUT_FOLDER}" \
    --min-box-size "${MIN_BOX_SIZE}" \
    --tile-height "${TILE_HEIGHT}" --tile-width "${TILE_WIDTH}"
else
  python -m yolov3_tpu.inference \
    --saved-model-filepath "${SAVED_MODEL}" \
    --image-folder "${IMAGE_FOLDER}" \
    --image-format "${IMAGE_FORMAT}" \
    --output-folder "${OUTPUT_FOLDER}" \
    --min-box-size "${MIN_BOX_SIZE}"
fi
