#!/bin/bash
# Round-3 session-3 TPU queue: finish the gate queue that session 2 left
# queued (conditional/CFG + imputation demos — /tmp was wiped between
# driver sessions again, so nothing from it survives).
#
# Differs from run_r3_session2_queue.sh in stage 3's prerequisite: instead
# of retraining the full 800+8000-epoch flagship (~35 min) purely to serve
# as the impute-LDM substrate, it trains a 400+2000-epoch flagship
# (DEMO_r2_lc3-scale; quality already proven at that budget) — the
# latent-imputation gate needs *a* trained LDM+AEKL pair, not the
# longest-horizon one. Every stage skips itself when its repo-root JSON
# exists, so supervisor restarts resume at the first unfinished stage.
#
# Run under the supervisor:
#   CONTACT_DEADLINE=240 STALL_SECS=2700 MAX_ATTEMPTS=20 \
#     scripts/run_with_tpu_retry.sh /tmp/r3_queue3.log scripts/run_r3_session3_queue.sh
set -eu
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site

if [ ! -f DEMO_COND_r3.json ]; then
  python scripts/demo_conditional.py --out /tmp/sleepgen_demo_cond
  cp /tmp/sleepgen_demo_cond/report.json DEMO_COND_r3.json
fi

if [ ! -f DEMO_IMPUTE_r3.json ]; then
  if [ ! -d /tmp/sleepgen_demo_cond/cond_dm ]; then
    echo "stage 2 prerequisite missing (/tmp/sleepgen_demo_cond/cond_dm gone" \
         "but DEMO_COND_r3.json exists) — delete the marker to re-train" >&2
    exit 2
  fi
  python scripts/demo_impute.py --out /tmp/sleepgen_demo_impute
  cp /tmp/sleepgen_demo_impute/report.json DEMO_IMPUTE_r3.json
fi

if [ ! -f DEMO_IMPUTE_LDM_r3.json ]; then
  if [ ! -d /tmp/sleepgen_impute_substrate/demo_ldm ]; then
    python scripts/demo_synthetic_e2e.py --out /tmp/sleepgen_impute_substrate \
      --aekl_epochs 400 --ldm_epochs 2000 --fast_train_math --sampler dpm++2m \
      --sample_steps 20
  fi
  python scripts/demo_impute.py \
    --dm_run /tmp/sleepgen_impute_substrate/demo_ldm \
    --aekl_run /tmp/sleepgen_impute_substrate/demo_aekl \
    --out /tmp/sleepgen_demo_impute_ldm
  cp /tmp/sleepgen_demo_impute_ldm/report.json DEMO_IMPUTE_LDM_r3.json
fi

echo QUEUE_DONE
