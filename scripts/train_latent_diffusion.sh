#!/usr/bin/env bash
# Launch latent_diffusion training (mirrors the reference's
# scripts/dist_train_latent_diffusion.sh surface; body in _train_common.sh).
# usage: bash scripts/train_latent_diffusion.sh [CONFIG] [RUN_PATH] [RESUME]
exec bash "$(dirname "$0")/_train_common.sh" "configs/celeba64_latent.yml" "runs/latent_diffusion" "$@"
