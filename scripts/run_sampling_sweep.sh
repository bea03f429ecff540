#!/usr/bin/env bash
# Sampling sweep: 1000 seeds per (spe, latent_channels) LDM run — parity
# with clusters/run_sampling_sleep_edfx.sh / run_dm_sampling_*.sh, except
# seeds are batched on-device instead of one job per seed range.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${OUT:-outputs}
DATASET=${DATASET:-edfx}
START=${START:-0}
STOP=${STOP:-1000}
BATCH=${BATCH:-128}
for spe in no-spectral spectral; do
  for lc in 1 3; do
    python -m sleepgen.cli.sample_trials \
      --output_dir "$OUT/samples" \
      --best_model_path "$OUT/aekl_eeg_${spe}_${DATASET}" \
      --diffusion_path "$OUT/ldm_eeg_${spe}_${DATASET}" \
      --spe "$spe" --latent_channels "$lc" \
      --start_seed "$START" --stop_seed "$STOP" --batch_size "$BATCH"
  done
done
