#!/usr/bin/env bash
# Stage-2 LDM sweep over spe x latent_channels against the matching stage-1
# runs — parity with clusters/run_ldm_jukebox_2.sh:5-35. Each LDM job reads
# its AEKL from the run dir the AEKL sweep produced (no re-stated channels).
set -euo pipefail
cd "$(dirname "$0")/.."
CONFIG=${CONFIG:-sleepgen/configs/ldm.yaml}
OUT=${OUT:-outputs}
DATASET=${DATASET:-edfx}
for spe in no-spectral spectral; do
  for lc in 1 3; do
    AEKL_RUN="$OUT/aekl_eeg_${spe}_${DATASET}"
    python -m sleepgen.cli.train_ldm \
      --config_file "$CONFIG" \
      --autoencoderkl_config_file_path "$AEKL_RUN/config.yaml" \
      --best_model_path "$AEKL_RUN" \
      --path_train_ids "$TRAIN_IDS" --path_valid_ids "$VALID_IDS" \
      --path_pre_processed "$DATA" \
      --spe "$spe" --latent_channels "$lc"
  done
done
