#!/usr/bin/env bash
# Launch latent_diffusion training.  One process per HOST (all local TPU chips
# are driven through GSPMD -- no per-chip process spawn like torchrun).
# Multi-host: export JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
# JAX_PROCESS_ID on each host and run this same script.
# usage: bash scripts/train_latent_diffusion.sh CONFIG RUN_PATH [RESUME]
set -e
cd "$(dirname "$0")/.."
CONFIG=${1:-configs/celeba64_latent.yml}
RUN=${2:-runs/latent_diffusion}
RESUME=${3:-}
ARGS=(--config_path "$CONFIG" --run_path "$RUN")
[ -n "$RESUME" ] && ARGS+=(--resume "$RESUME")
exec python scripts/train.py "${ARGS[@]}"
