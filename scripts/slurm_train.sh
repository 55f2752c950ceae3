#!/usr/bin/env bash
# SLURM batch launcher for a TPU-VM partition (equivalent of
# reference/sbatch_train.sh): single node, node-local scratch staging of the
# databases, source snapshot into the results dir, and cleanup on TERM.
#
#SBATCH --nodes=1
#SBATCH --ntasks=1
#SBATCH --cpus-per-task=80
#SBATCH --job-name=yolov3_tpu
#SBATCH --time=72:0:0
set -euo pipefail

TRAIN_DB="${1:?usage: slurm_train.sh <train_db> <test_db> <output_dir>}"
TEST_DB="${2:?}"
RESULTS_DIR="${3:?}"
TEST_EVERY_N_STEPS="${TEST_EVERY_N_STEPS:-10000}"

SCRATCH="/scratch/${SLURM_JOB_ID:-$$}"
mkdir -p "${SCRATCH}" "${RESULTS_DIR}"

cleanup() {
  echo "cleanup: removing ${SCRATCH}"
  rm -rf "${SCRATCH}"
}
trap cleanup TERM EXIT

# stage databases to node-local scratch for mmap-speed reads
cp -r "${TRAIN_DB}" "${SCRATCH}/"
cp -r "${TEST_DB}" "${SCRATCH}/"
TRAIN_LOCAL="${SCRATCH}/$(basename "${TRAIN_DB}")"
TEST_LOCAL="${SCRATCH}/$(basename "${TEST_DB}")"

# snapshot the source tree next to the results for reproducibility
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "${RESULTS_DIR}/src"
cp -r "${REPO_DIR}/yolov3_tpu" "${REPO_DIR}/native" "${REPO_DIR}/scripts" \
      "${RESULTS_DIR}/src/"

cd "${REPO_DIR}"
python -m yolov3_tpu.train \
  --train_database "${TRAIN_LOCAL}" \
  --test_database "${TEST_LOCAL}" \
  --output_dir "${RESULTS_DIR}" \
  --batch_size 8 \
  --test_every_n_steps "${TEST_EVERY_N_STEPS}"
