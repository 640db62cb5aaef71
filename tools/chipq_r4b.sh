#!/bin/bash
# Phase 4 of the round-4 chip queue: runs AFTER chipq_r4_followup.sh drains.
#   - diag_fused_dbwd --composed-only with VQVAE_TPU_DBWD_NO_ALIAS=1:
#     discriminates the aliasing-liveness hypothesis for the composed fp32
#     divergence (docs/DIAG_DBWD_r4.txt shows kernels exact at every block
#     shape but the composed full-D fp32 grads off by 0.26)
#   - probe_rng.py: threefry vs hardware-rbg gumbel cost at the flagship
#     logits shape (new lever candidate)
#   - profile_step.py --config gan: fresh hlo_stats under the current
#     defaults, for the next-lever hunt / ceiling analysis
# Results land in docs/ (repo-resident).

set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

{
  echo ""
  echo "=== diag composed-only, NO_ALIAS=1 $(date -u +%Y-%m-%dT%H:%MZ)"
  VQVAE_TPU_DBWD_NO_ALIAS=1 timeout 3600 python tools/diag_fused_dbwd.py --composed-only 2>&1
  echo "rc=$?"
} >> docs/DIAG_DBWD_r4.txt

{
  echo "=== probe_rng $(date -u +%Y-%m-%dT%H:%MZ)"
  timeout 2400 python tools/probe_rng.py 2>&1
  echo "rc=$?"
} > docs/RNG_r4.txt

{
  echo "=== profile_step gan $(date -u +%Y-%m-%dT%H:%MZ)"
  timeout 4200 python tools/profile_step.py --config gan 2>&1
  echo "rc=$?"
} > docs/PROFILE_r4.txt
echo "r4b done $(date)" >> docs/CHIPQ_r4.txt
