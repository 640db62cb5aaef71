#!/bin/bash
# Phase 7: vmem56 showed +0.35% over the vmem64 default (88.61 vs 88.30,
# docs/CHIPQ_r4.txt) — base has been stable to ±0.01 across rounds, so this
# is likely real. Confirm with two repro legs and bracket with 48/60 MiB
# before flipping the default. Runs after chipq_r4d drains (pass its PID).

set -u
cd "$(dirname "$0")/.."
RESULTS=docs/CHIPQ_r4.txt
LOGDIR=/tmp/chipq_r4e
mkdir -p "$LOGDIR"
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
echo "=== chipq_r4e start $(date)" >> "$RESULTS"

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

pre vmem48 VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=49152 &
pre vmem60 VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=61440 &
wait

leg vmem56_r1 VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=57344
leg base_r1
leg vmem56_r2 VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=57344
leg vmem48 VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=49152
leg vmem60 VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=61440
echo "=== chipq_r4e done $(date)" >> "$RESULTS"
