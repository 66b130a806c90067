#!/usr/bin/env bash
# Launch regular_diffusion training (mirrors the reference's
# scripts/dist_train_regular_diffusion.sh surface; body in _train_common.sh).
# usage: bash scripts/train_regular_diffusion.sh [CONFIG] [RUN_PATH] [RESUME]
exec bash "$(dirname "$0")/_train_common.sh" "configs/mnist_regular.yml" "runs/regular" "$@"
