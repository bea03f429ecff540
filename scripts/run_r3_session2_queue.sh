#!/bin/bash
# Round-3 session-2 TPU queue: /tmp was wiped between driver sessions, so
# the flagship r3ext run dirs (prerequisite of the impute-LDM gate in
# run_r3_tpu_gates.sh) no longer exist. Stage 0 retrains the flagship
# (exact DEMO_r3_ext.json recipe: 800-epoch AEKL + 8000-epoch LDM,
# fast_train_math, both samplers) into /tmp/sleepgen_demo_r3ext —
# doubling as a cross-session reproducibility check against the committed
# DEMO_r3_ext.json — then chains into the unfinished round-3 gate queue
# (conditional/CFG + imputation demos).
#
# Run under the supervisor:
#   CONTACT_DEADLINE=240 STALL_SECS=2700 MAX_ATTEMPTS=20 \
#     scripts/run_with_tpu_retry.sh /tmp/r3_queue.log scripts/run_r3_session2_queue.sh
set -eu
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site

if [ ! -f /tmp/sleepgen_demo_r3ext/report.json ]; then
  python scripts/demo_synthetic_e2e.py --out /tmp/sleepgen_demo_r3ext \
    --aekl_epochs 800 --ldm_epochs 8000 --fast_train_math --sampler both
fi

exec scripts/run_r3_tpu_gates.sh
