#!/usr/bin/env bash
# Launch manipulation training (mirrors the reference's
# scripts/dist_train_manipulation.sh surface; body in _train_common.sh).
# usage: bash scripts/train_manipulation.sh [CONFIG] [RUN_PATH] [RESUME]
exec bash "$(dirname "$0")/_train_common.sh" "configs/celebahq_manipulation.yml" "runs/manipulation" "$@"
