#!/usr/bin/env bash
# Single-host TPU launch helpers — the rebuild of the reference's RunAI
# cluster scripts (clusters/*.sh, src/bash/start_training.sh). The
# reference rewrote key=value args into --key value (start_training.sh:
# 15-27); sleepgen CLIs take standard flags, so these are plain wrappers.
set -euo pipefail
cd "$(dirname "$0")/.."

CMD=${1:?usage: launch_tpu.sh {aekl|ldm|dm|sample|decode} [args...]}
shift
case "$CMD" in
  aekl)   exec python -m sleepgen.cli.train_autoencoderkl "$@";;
  ldm)    exec python -m sleepgen.cli.train_ldm "$@";;
  dm)     exec python -m sleepgen.cli.train_pure_ldm "$@";;
  sample) exec python -m sleepgen.cli.sample_trials "$@";;
  decode) exec python -m sleepgen.cli.run_sleep_decode "$@";;
  *) echo "unknown command $CMD" >&2; exit 2;;
esac
