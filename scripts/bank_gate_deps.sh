#!/bin/bash
# Persistent gate-dependency store (VERDICT r4 stretch #9).
#
# TPU gate queues keep their expensive trained dependencies (conditional
# DM, USleep feature space, reference-batch run dirs) in /tmp, which is
# wiped between driver sessions — so a resumed queue used to retrain
# hours of work. ~/.cache survives session restarts (the XLA compile
# cache there carries data across sessions), and /tmp and ~/.cache are
# the same filesystem here, so `cp -al` banks a dependency as hardlinks
# in ~0 time and ~0 extra space; a /tmp wipe only drops the /tmp link.
#
# Usage:
#   scripts/bank_gate_deps.sh bank      # snapshot live /tmp deps -> store
#   scripts/bank_gate_deps.sh restore   # repopulate /tmp from the store
#
# `restore` is what a resumed queue session runs BEFORE relaunching
# scripts/run_r5_queue.sh: the queue's ensure_* guards then find their
# /tmp dependencies alive and skip the retrain.
set -euo pipefail

STORE=~/.cache/sleepgen/gate_deps
DEPS=(
  /tmp/sleepgen_demo_cond      # conditional DM + generated windows (stages 8-9)
  /tmp/sleepgen_decode_r4      # trained USleep feature space (stages 5-7)
  /tmp/sleepgen_refbatch       # reference-batch flagship run dirs (stages 5,7)
  /tmp/sleepgen_refbatch_spec  # reference-batch spectral run dirs (stage 6)
  /tmp/sleepgen_spec_balanced  # balanced-spectral gate run dirs (r5 late gate)
  /tmp/sleepgen_spec_mid       # mid-weight spectral gate run dirs (r5 late gate)
)

case "${1:-}" in
  bank)
    mkdir -p "$STORE"
    for d in "${DEPS[@]}"; do
      [ -d "$d" ] || { echo "[bank] skip $d (absent)"; continue; }
      tgt="$STORE/$(basename "$d")"
      tmp="$tgt.tmp.$$"
      cp -al "$d" "$tmp"           # atomic: build aside, then swap in
      rm -rf "$tgt"
      mv "$tmp" "$tgt"
      echo "[bank] $d -> $tgt"
    done
    ;;
  restore)
    for d in "${DEPS[@]}"; do
      src="$STORE/$(basename "$d")"
      [ -d "$src" ] || { echo "[restore] skip $d (not banked)"; continue; }
      if [ -d "$d" ]; then echo "[restore] skip $d (already live)"; continue; fi
      cp -al "$src" "$d"
      echo "[restore] $src -> $d"
    done
    ;;
  *)
    echo "usage: $0 bank|restore" >&2
    exit 2
    ;;
esac
