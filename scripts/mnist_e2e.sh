#!/usr/bin/env bash
# One-command MNIST end-to-end (BASELINE.json configs[0]):
#   fetch idx files -> train DDPM `STEPS` steps -> DDIM-100 sample grid.
#
# This environment has no network egress; on a connected machine the idx
# files download automatically.  Offline: place the four
# {train,t10k}-{images-idx3,labels-idx1}-ubyte[.gz] files under $DATA
# yourself.  The pipeline itself is CI-validated end-to-end on synthetic
# idx files by tests/test_mnist_e2e.py.
#
# Usage: bash scripts/mnist_e2e.sh [--platform cpu]
set -euo pipefail
cd "$(dirname "$0")/.."

DATA=${DATA:-./data/mnist}
RUN=${RUN:-./runs/mnist_regular}
STEPS=${STEPS:-200}
PLATFORM_ARGS=("$@")

mkdir -p "$DATA"
for f in train-images-idx3-ubyte.gz train-labels-idx1-ubyte.gz \
         t10k-images-idx3-ubyte.gz t10k-labels-idx1-ubyte.gz; do
  if [ ! -f "$DATA/$f" ] && [ ! -f "$DATA/${f%.gz}" ]; then
    echo "fetching $f"
    curl -fsSL "https://ossci-datasets.s3.amazonaws.com/mnist/$f" \
        -o "$DATA/$f" \
      || curl -fsSL "http://yann.lecun.com/exdb/mnist/$f" -o "$DATA/$f"
  fi
done

python scripts/train.py --config_path configs/mnist_regular.yml \
    --run_path "$RUN" --max_steps "$STEPS" \
    ${PLATFORM_ARGS[@]+"${PLATFORM_ARGS[@]}"}

# sampler config pointing at the finished run
SAMPLER_CFG="$RUN/test_dpms.yml"
cat > "$SAMPLER_CFG" <<EOF
diffusion_config:
  timesteps: 1000
  betas_type: linear
config_path: $RUN/config.yml
checkpoint_path: $RUN/checkpoints/latest.ckpt
image_channel: 1
image_size: 32
num_samples: 9
ddim_style: ddim100
output_path: $RUN/samples/test_dpms_result.png
EOF
python scripts/sample.py --sampler test_dpms --config "$SAMPLER_CFG" \
    ${PLATFORM_ARGS[@]+"${PLATFORM_ARGS[@]}"}
echo "MNIST e2e complete: grid at $RUN/samples/test_dpms_result.png"
