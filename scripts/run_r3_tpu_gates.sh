#!/bin/bash
# Round-3 TPU gate queue — run under scripts/run_with_tpu_retry.sh so it
# rides out the relay's first-contact wedges and mid-run stalls:
#
#   1. class-conditional + CFG gate (scripts/demo_conditional.py)
#        -> DEMO_COND_r3.json
#   2. imputation gate, signal-space DM mode (scripts/demo_impute.py)
#        -> DEMO_IMPUTE_r3.json
#   3. imputation gate, LDM latent mode on the flagship r3ext checkpoints
#        -> DEMO_IMPUTE_LDM_r3.json
#
# Each stage skips itself when its repo-root JSON already exists, so a
# supervisor restart resumes at the first unfinished stage (stage 1's
# training also self-resumes from its run-dir checkpoints).
#
# Usage:
#   CONTACT_DEADLINE=240 STALL_SECS=1800 MAX_ATTEMPTS=60 \
#     scripts/run_with_tpu_retry.sh /tmp/r3_gates.log scripts/run_r3_tpu_gates.sh
set -eu
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site

# fail fast on missing prerequisites instead of burning the supervisor's
# retry budget: stage 2 consumes stage 1's /tmp run dir (gone if /tmp was
# wiped while the repo-root skip-marker survived), stage 3 needs the
# flagship r3ext checkpoints which nothing in this queue creates
if [ -f DEMO_COND_r3.json ] && [ ! -f DEMO_IMPUTE_r3.json ] \
    && [ ! -d /tmp/sleepgen_demo_cond/cond_dm ]; then
  echo "stage 2 prerequisite missing (/tmp/sleepgen_demo_cond/cond_dm gone" \
       "but DEMO_COND_r3.json exists) — delete the marker to re-train" >&2
  exit 2
fi
if [ ! -f DEMO_IMPUTE_LDM_r3.json ] && [ ! -d /tmp/sleepgen_demo_r3ext/demo_ldm ]; then
  echo "stage 3 prerequisite missing: /tmp/sleepgen_demo_r3ext flagship" \
       "run dirs (produced by the round-3 extended demo, not this queue)" >&2
  exit 2
fi

if [ ! -f DEMO_COND_r3.json ]; then
  python scripts/demo_conditional.py --out /tmp/sleepgen_demo_cond
  cp /tmp/sleepgen_demo_cond/report.json DEMO_COND_r3.json
fi

if [ ! -f DEMO_IMPUTE_r3.json ]; then
  python scripts/demo_impute.py --out /tmp/sleepgen_demo_impute
  cp /tmp/sleepgen_demo_impute/report.json DEMO_IMPUTE_r3.json
fi

if [ ! -f DEMO_IMPUTE_LDM_r3.json ]; then
  python scripts/demo_impute.py \
    --dm_run /tmp/sleepgen_demo_r3ext/demo_ldm \
    --aekl_run /tmp/sleepgen_demo_r3ext/demo_aekl \
    --out /tmp/sleepgen_demo_impute_ldm
  cp /tmp/sleepgen_demo_impute_ldm/report.json DEMO_IMPUTE_LDM_r3.json
fi

echo QUEUE_DONE
