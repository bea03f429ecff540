#!/bin/bash
# Supervise a TPU job against the axon relay's first-contact wedge: a fresh
# client occasionally blocks forever in its first recv. The supervised
# command must print TPU_CONTACT_OK once its first device op completes
# (see scripts/demo_decode_r2.py); attempts that do not print it within
# $CONTACT_DEADLINE seconds are killed and retried.
#
# Usage: run_with_tpu_retry.sh LOGFILE CMD [ARGS...]
set -u
LOG=$1; shift
CONTACT_DEADLINE=${CONTACT_DEADLINE:-240}
MAX_ATTEMPTS=${MAX_ATTEMPTS:-5}

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  : > "$LOG"
  "$@" >> "$LOG" 2>&1 &
  pid=$!
  echo "[retry-supervisor] attempt $attempt pid $pid" >&2
  ok=""
  for ((i = 0; i < CONTACT_DEADLINE / 5; i++)); do
    sleep 5
    if ! kill -0 "$pid" 2>/dev/null; then break; fi
    if grep -q TPU_CONTACT_OK "$LOG"; then ok=1; break; fi
  done
  if [ -n "$ok" ]; then
    wait "$pid"
    exit $?
  fi
  if ! kill -0 "$pid" 2>/dev/null; then
    # process exited before contact: propagate its status
    wait "$pid"
    rc=$?
    [ "$rc" -eq 0 ] && exit 0
    echo "[retry-supervisor] attempt $attempt exited rc=$rc before contact" >&2
    continue
  fi
  echo "[retry-supervisor] no TPU contact in ${CONTACT_DEADLINE}s; killing $pid" >&2
  kill "$pid" 2>/dev/null
  sleep 2
  kill -9 "$pid" 2>/dev/null
done
echo "[retry-supervisor] giving up after $MAX_ATTEMPTS attempts" >&2
exit 1
