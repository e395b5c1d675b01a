#!/usr/bin/env bash
# TPU-VM launch script — the reference's HPC deployment equivalent
# (ref run_job.slurm: 1 node / 1 GPU / 4 h SLURM batch; deploy.ps1: scp of
# the source files). On Cloud TPU the unit is a TPU VM: code syncs with
# gcloud scp/rsync and runs directly on the VM, which owns all local chips.
#
# Usage:
#   ./scripts/run_tpu_vm.sh <tpu-name> <zone> [command] [overrides...]
# Example:
#   ./scripts/run_tpu_vm.sh seld-v5e-8 us-west4-a train model.model_type=crnn
#
# Set DRY_RUN=1 (or pass --print-only as the first argument) to print the
# exact gcloud commands instead of executing them — used by the test suite
# and for pre-flight review.
set -euo pipefail

if [[ "${1:-}" == "--print-only" ]]; then
  DRY_RUN=1
  shift
fi
DRY_RUN="${DRY_RUN:-0}"

TPU_NAME="${1:?tpu name}"
ZONE="${2:?zone}"
COMMAND="${3:-train}"
# shift past the consumed args only — `shift 3` with 2 args shifts NOTHING
# (bash leaves $@ untouched), which would leak the tpu name/zone into the
# override list below.
shift "$(( $# < 3 ? $# : 3 ))"

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"

run() {
  if [[ "${DRY_RUN}" == "1" ]]; then
    printf '%q ' "$@"
    printf '\n'
  else
    "$@"
  fi
}

# 1) Sync the framework to the TPU VM (all workers). The remote dir must
#    exist before scp targets it (fresh VMs have no ~/seld_tpu_run).
run gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" --worker=all \
  --command "mkdir -p ~/seld_tpu_run"
run gcloud compute tpus tpu-vm scp --recurse "${REPO_DIR}/seld_tpu" \
  "${TPU_NAME}:~/seld_tpu_run/" --zone "${ZONE}" --worker=all
run gcloud compute tpus tpu-vm scp "${REPO_DIR}/bench.py" \
  "${TPU_NAME}:~/seld_tpu_run/" --zone "${ZONE}" --worker=all

# 2) Launch training. Logs stream back; checkpoints land on the VM disk
#    (point data.checkpoint_path at a GCS fuse mount for durability).
run gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" --worker=all \
  --command "cd ~/seld_tpu_run && python -m seld_tpu.cli ${COMMAND} $*"
