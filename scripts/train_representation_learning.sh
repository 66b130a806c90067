#!/usr/bin/env bash
# Launch representation_learning training (mirrors the reference's
# scripts/dist_train_representation_learning.sh surface; body in _train_common.sh).
# usage: bash scripts/train_representation_learning.sh [CONFIG] [RUN_PATH] [RESUME]
exec bash "$(dirname "$0")/_train_common.sh" "configs/celeba64_representation_learning.yml" "runs/representation_learning" "$@"
