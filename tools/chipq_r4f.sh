#!/bin/bash
# Phase 8 (post-default-flip: vmem56 is now the framework default, so plain
# `python bench.py` IS the new base). Two fresh levers from the round-4
# profile work:
#   tapvjp — fused LPIPS tap-score VJP (models/lpips.py:_tap_score): saves
#            the tap DIFFERENCE as the only full-res residual, cutting ~1
#            large read per tap from the LPIPS backward.
#   b64    — per-step batch 64 x accum 4 (same cumulative 256): bigger
#            bandwidth-bound fusions, fewer dispatches; remat auto-gate may
#            flip, so also probe b64 with remat explicitly off.
# Runs after the in-flight full-defaults bench drains (pass its PID).

set -u
cd "$(dirname "$0")/.."
RESULTS=docs/CHIPQ_r4.txt
LOGDIR=/tmp/chipq_r4f
mkdir -p "$LOGDIR"
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
echo "=== chipq_r4f start $(date)" >> "$RESULTS"

pre() {
  local name="$1"; shift
  env XLA_PYTHON_CLIENT_PREALLOCATE=false VQGAN_BENCH_PRECOMPILE=1 \
      VQGAN_BENCH_SECONDARY=0 VQGAN_BENCH_WAIT_S=2400 "$@" \
      timeout 4200 python bench.py > "$LOGDIR/pre_$name.log" 2>&1
  echo "precompile $name: rc=$? $(date +%T)" >> "$RESULTS"
}

leg() {
  local name="$1"; shift
  env VQGAN_BENCH_SECONDARY=0 VQGAN_BENCH_WAIT_S=2400 "$@" \
      timeout 4200 python bench.py > "$LOGDIR/bench_$name.log" 2>&1
  local line
  line=$(grep -a '^{' "$LOGDIR/bench_$name.log" | tail -1)
  echo "$name: ${line:-FAILED_OR_TIMEOUT}" >> "$RESULTS"
}

pre tapvjp VQVAE_TPU_LPIPS_TAPVJP=1 &
pre b64 VQGAN_BENCH_BATCH=64 VQGAN_BENCH_ACCUM=4 &
wait

leg tapvjp VQVAE_TPU_LPIPS_TAPVJP=1
leg b64 VQGAN_BENCH_BATCH=64 VQGAN_BENCH_ACCUM=4
leg tapvjp_r2 VQVAE_TPU_LPIPS_TAPVJP=1
# insurance: if b64 OOMs with remat pinned off (bench default), measure it
# under the auto gate instead
if grep -q FAILED_OR_TIMEOUT <(tail -2 "$RESULTS" | grep '^b64') 2>/dev/null \
   || ! grep -aq '^{' "$LOGDIR/bench_b64.log"; then
  leg b64_rematauto VQGAN_BENCH_BATCH=64 VQGAN_BENCH_ACCUM=4 VQGAN_BENCH_REMAT=auto
fi
echo "=== chipq_r4f done $(date)" >> "$RESULTS"
