#!/usr/bin/env bash
# Shared launcher body for the four train_*.sh wrappers (which mirror the
# reference's four scripts/dist_train_*.sh entry points).  One process per
# HOST (all local TPU chips are driven through GSPMD -- no per-chip
# process spawn like torchrun).  Multi-host: export
# JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID on each host
# and run the same wrapper.
# args: DEFAULT_CONFIG DEFAULT_RUN [CONFIG] [RUN_PATH] [RESUME]
set -e
cd "$(dirname "$0")/.."
CONFIG=${3:-$1}
RUN=${4:-$2}
RESUME=${5:-}
ARGS=(--config_path "$CONFIG" --run_path "$RUN")
[ -n "$RESUME" ] && ARGS+=(--resume "$RESUME")
exec python scripts/train.py "${ARGS[@]}"
