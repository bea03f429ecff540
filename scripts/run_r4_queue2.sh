#!/bin/bash
# SUPERSEDED by run_r5_queue.sh (session-proof dep rebuilds + persistent
# dep bank + artifact-after-rc-check). Kept as the round-4 record only;
# do not launch for new gates.
#
# Round-4 TPU queue 2 — runs after run_r3_session3_queue.sh (the
# conditional/impute gates). Every stage skips itself when its repo-root
# JSON exists, so supervisor restarts resume at the first unfinished
# stage (single TPU client: stages run strictly sequentially).
#
#   1. SPECTRAL_AUDIT_r4.json  — spectral:L1 grad-ratio vs batch (VERDICT #2)
#   2. /tmp usleep_run         — trained USleep feature space (decode demo)
#   3. DEMO_r4_refbatch.json   — flagship at the reference's configured
#                                batches: AEKL 2048 / LDM 1024 (VERDICT #4)
#   4. DEMO_r4_refbatch_spectral.json — same batches, spectral axis: does
#                                the MS-SSIM 0.0 / trained-FID regression
#                                survive at reference balance? (VERDICT #2)
#   5. BANDS_r4.json           — per-band MS-SSIM/FID table off stage 3's
#                                run dirs (VERDICT #3)
#   6. DEMO_SHHS_r4.json       — SHHS-axis e2e CLI-chain demo (VERDICT #8)
#   7. SERVE_r4.json           — serving bench incl. the new pipelined
#                                request path (VERDICT #7)
#
# Run under the supervisor:
#   CONTACT_DEADLINE=240 STALL_SECS=2700 MAX_ATTEMPTS=20 \
#     scripts/run_with_tpu_retry.sh /tmp/r4_queue2.log scripts/run_r4_queue2.sh
# pipefail: a bench crash mid-pipe must fail the stage, not ship a
# truncated artifact that the exists-means-done gating then skips forever
# (ADVICE r4). run_r5_queue.sh additionally rc-checks before writing.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site

REFB=/tmp/sleepgen_refbatch

# RePaint resampling-jump rerun: the r3 impute gate (num_resample=1) beat
# noise-fill and interp-MSE but lost masked-span PSD corr to linear
# interpolation by 0.03 — RePaint's jumps (r=4) harmonize exactly this
if [ ! -f DEMO_IMPUTE_r4.json ] && [ -d /tmp/sleepgen_demo_cond/cond_dm ]; then
  python scripts/demo_impute.py --out /tmp/sleepgen_demo_impute_r4 \
    --num_resample 4
  cp /tmp/sleepgen_demo_impute_r4/report.json DEMO_IMPUTE_r4.json
fi

if [ ! -f SPECTRAL_AUDIT_r4.json ]; then
  python scripts/audit_spectral_balance.py --out /tmp/sleepgen_spec_audit \
    --batches 256,1024,2048 --warm_epochs 100 \
    --report SPECTRAL_AUDIT_r4.json
fi

# trained USleep (discriminative FID space for stages 3-5); quality of the
# decode harness itself is already gated by DEMO_DECODE_r3.json
if [ ! -d /tmp/sleepgen_decode_r4/usleep_run ]; then
  python scripts/demo_decode.py --out /tmp/sleepgen_decode_r4 \
    --skip a,c,ref --report /tmp/sleepgen_decode_r4/decode_report.json
fi

if [ ! -f DEMO_r4_refbatch.json ]; then
  python scripts/demo_synthetic_e2e.py --out $REFB \
    --n_recordings 2926 --duration_s 60 --batch_size 2048 \
    --ldm_batch_size 1024 --aekl_epochs 400 --ldm_epochs 2000 \
    --fast_train_math --sampler both --sample_steps 200 \
    --usleep_checkpoint /tmp/sleepgen_decode_r4/usleep_run
  cp $REFB/report.json DEMO_r4_refbatch.json
fi

if [ ! -f DEMO_r4_refbatch_spectral.json ]; then
  python scripts/demo_synthetic_e2e.py --out /tmp/sleepgen_refbatch_spec \
    --n_recordings 2926 --duration_s 60 --batch_size 2048 \
    --ldm_batch_size 1024 --aekl_epochs 400 --ldm_epochs 2000 \
    --fast_train_math --sampler both --sample_steps 200 --spe \
    --usleep_checkpoint /tmp/sleepgen_decode_r4/usleep_run
  cp /tmp/sleepgen_refbatch_spec/report.json DEMO_r4_refbatch_spectral.json
fi

if [ ! -f BANDS_r4.json ]; then
  python scripts/run_band_eval.py \
    --aekl_run $REFB/demo_aekl --sample_dir $REFB/samples \
    --n_recordings 2926 --duration_s 60 \
    --usleep_checkpoint /tmp/sleepgen_decode_r4/usleep_run \
    --out /tmp/sleepgen_band_eval --report BANDS_r4.json
fi

if [ ! -f DEMO_SHHS_r4.json ]; then
  python scripts/demo_shhs_e2e.py --out /tmp/sleepgen_demo_shhs \
    --report DEMO_SHHS_r4.json
fi

if [ ! -f SERVE_r4.json ]; then
  python benches/serve_latency.py | grep '^{' > /tmp/serve_r4_rows.jsonl
  python - << 'EOF'
import json
rows = [json.loads(l) for l in open('/tmp/serve_r4_rows.jsonl')]
json.dump({"rows": rows}, open('SERVE_r4.json', 'w'), indent=1)
EOF
fi

echo QUEUE2_DONE
