#!/bin/bash
# Phase 6 of the round-4 chip queue: final compiler-flag sweep + a
# full-defaults bench shakeout (incl. the new secondary legs) so BENCH_r04
# has no first-run surprises. Candidate flags ride on top of the shipped
# vmem64 default (VQVAE_TPU_XLA_OPTS REPLACES the default, so combo legs
# restate it). Unknown flags fail fast at precompile (the remote compile
# helper validates them) — that leg just reports rc!=0.

set -u
cd "$(dirname "$0")/.."
RESULTS=docs/CHIPQ_r4.txt
LOGDIR=/tmp/chipq_r4d
mkdir -p "$LOGDIR"
echo "=== chipq_r4d start $(date)" >> "$RESULTS"

pre() { # name, env...
  local name="$1"; shift
  env XLA_PYTHON_CLIENT_PREALLOCATE=false VQGAN_BENCH_PRECOMPILE=1 \
      VQGAN_BENCH_SECONDARY=0 VQGAN_BENCH_WAIT_S=2400 "$@" \
      timeout 4200 python bench.py > "$LOGDIR/pre_$name.log" 2>&1
  echo "precompile $name: rc=$? $(date +%T)" >> "$RESULTS"
}

leg() { # name, env...
  local name="$1"; shift
  env VQGAN_BENCH_SECONDARY=0 VQGAN_BENCH_WAIT_S=2400 "$@" \
      timeout 4200 python bench.py > "$LOGDIR/bench_$name.log" 2>&1
  local line
  line=$(grep -a '^{' "$LOGDIR/bench_$name.log" | tail -1)
  echo "$name: ${line:-FAILED_OR_TIMEOUT}" >> "$RESULTS"
}

V64=xla_tpu_scoped_vmem_limit_kib=65536

pre vmem72 VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=73728 &
pre vmem56 VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=57344 &
pre aggfuse VQVAE_TPU_XLA_OPTS=$V64,xla_tpu_enable_aggressive_loop_fusion_layout_opt=true &
wait
pre prefetch VQVAE_TPU_XLA_OPTS=$V64,xla_tpu_use_repeated_instance_for_preferred_prefetch_time=true &
pre licm VQVAE_TPU_XLA_OPTS=$V64,xla_tpu_licm_size_inflation_ratio=2.0 &
wait

leg vmem72 VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=73728
leg vmem56 VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=57344
leg aggfuse VQVAE_TPU_XLA_OPTS=$V64,xla_tpu_enable_aggressive_loop_fusion_layout_opt=true
leg prefetch VQVAE_TPU_XLA_OPTS=$V64,xla_tpu_use_repeated_instance_for_preferred_prefetch_time=true
leg licm VQVAE_TPU_XLA_OPTS=$V64,xla_tpu_licm_size_inflation_ratio=2.0

# full-defaults shakeout: exactly what the driver will run, secondaries on
{
  VQGAN_BENCH_WAIT_S=2400 timeout 5400 python bench.py > "$LOGDIR/bench_full.log" 2>&1
  line=$(grep -a '^{' "$LOGDIR/bench_full.log" | tail -1)
  echo "full-defaults: ${line:-FAILED_OR_TIMEOUT}" >> "$RESULTS"
}
echo "=== chipq_r4d done $(date)" >> "$RESULTS"
