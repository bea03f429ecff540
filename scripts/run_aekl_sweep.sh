#!/usr/bin/env bash
# Sweep spe x latent_channels — parity with clusters/run_aekl_jukebox_2.sh:4-22.
set -euo pipefail
cd "$(dirname "$0")/.."
CONFIG=${CONFIG:-sleepgen/configs/aekl_eeg.yaml}
for spe in spectral no-spectral; do
  for lc in 1 3; do
    python -m sleepgen.cli.train_autoencoderkl \
      --config_file "$CONFIG" \
      --path_train_ids "$TRAIN_IDS" --path_valid_ids "$VALID_IDS" \
      --path_pre_processed "$DATA" \
      --spe "$spe" --latent_channels "$lc" --dataset "${DATASET:-edfx}"
  done
done
