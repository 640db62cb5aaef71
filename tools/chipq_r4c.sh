#!/bin/bash
# Phase 5 of the round-4 chip queue: composed-program bug isolation for the
# fused D-backward kernel. docs/DIAG_DBWD_r4.txt so far: kernels exact at
# every block shape standalone; composed full-D fp32 diverges 0.26 (alias)
# and 0.345 (no-alias) -> not aliasing. The skip kernel (no revisit
# accumulator) composes EXACTLY, so these legs isolate the multi-output
# revisit db-accumulator, each in a fresh process (env is trace-baked):
#   1. NO_DBACC            (kernel outputs dp only; db = XLA reduce)
#   2. NO_DBACC + NO_ALIAS (both suspects off)
# Each leg also runs the primal-value corruption probe added to the diag.

set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

{
  echo ""
  echo "=== diag composed-only, NO_DBACC=1 $(date -u +%Y-%m-%dT%H:%MZ)"
  VQVAE_TPU_DBWD_NO_DBACC=1 timeout 3600 python tools/diag_fused_dbwd.py --composed-only 2>&1
  echo "rc=$?"
  echo ""
  echo "=== diag composed-only, NO_DBACC=1 NO_ALIAS=1 $(date -u +%Y-%m-%dT%H:%MZ)"
  VQVAE_TPU_DBWD_NO_DBACC=1 VQVAE_TPU_DBWD_NO_ALIAS=1 \
    timeout 3600 python tools/diag_fused_dbwd.py --composed-only 2>&1
  echo "rc=$?"
  echo ""
  echo "=== diag composed-only, baseline config w/ primal probe $(date -u +%Y-%m-%dT%H:%MZ)"
  timeout 3600 python tools/diag_fused_dbwd.py --composed-only 2>&1
  echo "rc=$?"
} >> docs/DIAG_DBWD_r4.txt
echo "r4c done $(date)" >> docs/CHIPQ_r4.txt
