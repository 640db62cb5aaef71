#!/bin/bash
# Phase 3 of the round-4 chip queue: runs AFTER tools/chipq_r4.sh drains.
#   - diag_fused_dbwd.py: discriminate kernel-bug vs bf16-path-noise for the
#     VALIDATE_r4 full-D probe failure (docs/DIAG_DBWD_r4.txt)
#   - probe_max_resolution.py: single-chip tokenization ceiling (VERDICT r3
#     item 7) (docs/RESOLUTION_r4.txt)
# Results land in docs/ (in the repo); combo-leg selection happens manually
# from docs/CHIPQ_r4.txt afterwards.

set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

{
  echo "=== diag_fused_dbwd $(date -u +%Y-%m-%dT%H:%MZ)"
  timeout 3600 python tools/diag_fused_dbwd.py 2>&1
  echo "rc=$?"
} > docs/DIAG_DBWD_r4.txt

{
  echo "=== probe_max_resolution $(date -u +%Y-%m-%dT%H:%MZ)"
  timeout 3600 python tools/probe_max_resolution.py 2>&1
  echo "rc=$?"
} > docs/RESOLUTION_r4.txt
echo "followup done $(date)" >> docs/CHIPQ_r4.txt
