#!/usr/bin/env bash
# Launch representation_learning training.  One process per HOST (all local TPU chips
# are driven through GSPMD -- no per-chip process spawn like torchrun).
# Multi-host: export JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
# JAX_PROCESS_ID on each host and run this same script.
# usage: bash scripts/train_representation_learning.sh CONFIG RUN_PATH [RESUME]
set -e
cd "$(dirname "$0")/.."
CONFIG=${1:-configs/celeba64_representation_learning.yml}
RUN=${2:-runs/representation_learning}
RESUME=${3:-}
ARGS=(--config_path "$CONFIG" --run_path "$RUN")
[ -n "$RESUME" ] && ARGS+=(--resume "$RESUME")
exec python scripts/train.py "${ARGS[@]}"
