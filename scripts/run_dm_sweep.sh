#!/usr/bin/env bash
# Signal-space DM sweep over spe + its sampling — parity with
# clusters/run_dm_2.sh + run_dm_sampling_*.sh.
set -euo pipefail
cd "$(dirname "$0")/.."
CONFIG=${CONFIG:-sleepgen/configs/dm.yaml}
OUT=${OUT:-outputs}
DATASET=${DATASET:-edfx}
for spe in no-spectral spectral; do
  python -m sleepgen.cli.train_pure_ldm \
    --config_file "$CONFIG" \
    --path_train_ids "$TRAIN_IDS" --path_valid_ids "$VALID_IDS" \
    --path_pre_processed "$DATA" --spe "$spe"
  python -m sleepgen.cli.sample_trials_ddpm \
    --output_dir "$OUT/samples" \
    --diffusion_path "$OUT/dm_eeg_${spe}_${DATASET}" \
    --spe "$spe" --start_seed "${START:-0}" --stop_seed "${STOP:-1000}"
done
