#!/usr/bin/env bash
# Metrics sweep: MS-SSIM reconstruction + test-pair floor + FID (+ floor)
# per (spe, latent_channels) — parity with the reference's metric job
# scripts (clusters/run_mmse.sh etc.).
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${OUT:-outputs}
DATASET=${DATASET:-edfx}
for spe in no-spectral spectral; do
  for lc in 1 3; do
    RUN="$OUT/aekl_eeg_${spe}_${DATASET}"
    python -m sleepgen.cli.compute_mmds --best_model_path "$RUN" \
      --path_test_ids "$TEST_IDS" --path_pre_processed "$DATA" \
      --output_dir "$OUT/metrics" --spe "$spe" --latent_channels "$lc"
    python -m sleepgen.cli.compute_mmds --mode test_pairs \
      --best_model_path "$RUN" \
      --path_test_ids "$TEST_IDS" --path_pre_processed "$DATA" \
      --output_dir "$OUT/metrics" --spe "$spe" --latent_channels "$lc"
    python -m sleepgen.cli.compute_fid \
      --path_test_ids "$TEST_IDS" --path_pre_processed "$DATA" \
      --sample_dir "$OUT/samples/samples_ldm_${lc}_${spe}_${DATASET}"
  done
done
