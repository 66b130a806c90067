#!/usr/bin/env bash
# usage: bash scripts/run_sampler.sh SAMPLER [CONFIG]
set -e
cd "$(dirname "$0")/.."
SAMPLER=${1:?sampler name}
CONFIG=${2:-configs/sampler/$SAMPLER.yml}
exec python scripts/sample.py --sampler "$SAMPLER" --config "$CONFIG"
