#!/bin/bash
# Round-4 on-chip measurement queue (VERDICT r3 "Next round" #1-#3).
#
# Order of business:
#   0. validate_tpu.py — Mosaic-lowering + numerics acceptance for the fused
#      D-backward kernels on real silicon (gate: no A/B leg flips a default
#      unless this passes). Log lands in docs/VALIDATE_r4.md.
#   1. Precompiles: overlap variant compiles on the remote compile helper via
#      bench.py's AOT precompile mode (no step execution -> no activation
#      memory; XLA_PYTHON_CLIENT_PREALLOCATE=false so 2-3 clients coexist).
#      Includes 'base' (ADVICE r3: its cold compile otherwise lands in the
#      timed run's wall clock).
#   2. Timed legs run SERIALLY (one chip; timing must not contend), each
#      hitting the persistent compile cache populated in phase 1.
#
# Results: ONE line per leg appended to docs/CHIPQ_r4.txt (IN THE REPO —
# round-3's /tmp results file did not survive the environment).

set -u
cd "$(dirname "$0")/.."
RESULTS=${RESULTS:-docs/CHIPQ_r4.txt}
LOGDIR=${LOGDIR:-/tmp/chipq_r4}
mkdir -p "$LOGDIR" docs
echo "=== chipq_r4 start $(date)" >> "$RESULTS"

# ---- phase 0: on-chip kernel acceptance ------------------------------------
if [ "${SKIP_VALIDATE:-0}" != "1" ]; then
  {
    echo "# TPU kernel acceptance — round 4 ($(date -u +%Y-%m-%dT%H:%MZ))"
    echo
    echo "\`python tools/validate_tpu.py\` on the real chip:"
    echo
    echo '```'
  } > docs/VALIDATE_r4.md
  timeout 3600 python tools/validate_tpu.py >> docs/VALIDATE_r4.md 2> "$LOGDIR/validate.err"
  VRC=$?
  echo '```' >> docs/VALIDATE_r4.md
  echo "validate_tpu: rc=$VRC $(date +%T)" >> "$RESULTS"
  if [ $VRC -ne 0 ]; then
    echo "(rc=$VRC — see $LOGDIR/validate.err; fused-kernel legs gated off)" >> docs/VALIDATE_r4.md
  fi
fi

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

# ---- phase 1: precompiles, <=3 concurrent ----------------------------------
pre base &
pre dbwdskip VQVAE_TPU_FUSED_DBWD=1 VQVAE_TPU_FUSED_SKIP=1 &
pre bundle VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536,xla_tpu_use_bundle_aware_cost_model_for_fusions=true &
wait
pre dbwd VQVAE_TPU_FUSED_DBWD=1 &
pre padout VQVAE_TPU_PAD_CONV_OUT=1 &
pre vmem80 VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=81920 &
wait
pre sepfir VQVAE_TPU_SEPARABLE_FIR=1 &
wait

# ---- phase 2: timed legs, serial --------------------------------------------
leg base
leg dbwdskip VQVAE_TPU_FUSED_DBWD=1 VQVAE_TPU_FUSED_SKIP=1
leg dbwd VQVAE_TPU_FUSED_DBWD=1
leg bundle VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536,xla_tpu_use_bundle_aware_cost_model_for_fusions=true
leg vmem80 VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=81920
leg padout VQVAE_TPU_PAD_CONV_OUT=1
leg sepfir VQVAE_TPU_SEPARABLE_FIR=1
echo "=== chipq_r4 done $(date)" >> "$RESULTS"
