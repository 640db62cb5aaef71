#!/bin/bash
# Round-3 on-chip A/B queue for the built perf levers (docs/ROADMAP.md).
#
# Phase 1: overlap the variant compiles on the remote compile helper via
#   bench.py's AOT precompile mode (no step execution -> no activation
#   memory; XLA_PYTHON_CLIENT_PREALLOCATE=false so 2-3 clients coexist).
# Phase 2: timed legs run SERIALLY (one chip; timing must not contend),
#   each hitting the persistent compile cache populated in phase 1.
#
# One result line per leg lands in $RESULTS.

set -u
cd "$(dirname "$0")/.."
RESULTS=${RESULTS:-/tmp/chipq_r3_results.txt}
echo "=== chipq_r3 start $(date)" >> "$RESULTS"

pre() { # name, env...
  local name="$1"; shift
  env XLA_PYTHON_CLIENT_PREALLOCATE=false VQGAN_BENCH_PRECOMPILE=1 \
      VQGAN_BENCH_SECONDARY=0 VQGAN_BENCH_WAIT_S=2400 "$@" \
      timeout 3600 python bench.py > "/tmp/pre_$name.log" 2>&1
  echo "precompile $name: rc=$? $(date +%T)" >> "$RESULTS"
}

leg() { # name, env...
  local name="$1"; shift
  env VQGAN_BENCH_SECONDARY=0 VQGAN_BENCH_WAIT_S=2400 "$@" \
      timeout 3600 python bench.py > "/tmp/bench_$name.log" 2>&1
  local line
  line=$(grep -a '^{' "/tmp/bench_$name.log" | tail -1)
  echo "$name: ${line:-FAILED_OR_TIMEOUT}" >> "$RESULTS"
}

# ---- phase 1: precompiles, 3 concurrent max -------------------------------
pre dbwdskip VQVAE_TPU_FUSED_DBWD=1 VQVAE_TPU_FUSED_SKIP=1 &
pre bundle VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536,xla_tpu_use_bundle_aware_cost_model_for_fusions=true &
pre vmem80 VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=81920 &
wait
pre dbwd VQVAE_TPU_FUSED_DBWD=1 &
pre padout VQVAE_TPU_PAD_CONV_OUT=1 &
pre sepfir VQVAE_TPU_SEPARABLE_FIR=1 &
wait

# ---- phase 2: timed legs, serial ------------------------------------------
leg base
leg dbwdskip VQVAE_TPU_FUSED_DBWD=1 VQVAE_TPU_FUSED_SKIP=1
leg dbwd VQVAE_TPU_FUSED_DBWD=1
leg bundle VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536,xla_tpu_use_bundle_aware_cost_model_for_fusions=true
leg vmem80 VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=81920
leg padout VQVAE_TPU_PAD_CONV_OUT=1
leg sepfir VQVAE_TPU_SEPARABLE_FIR=1
echo "=== chipq_r3 done $(date)" >> "$RESULTS"
