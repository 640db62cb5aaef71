#!/bin/bash
# On-chip A/B measurement queue — the ONE parameterized successor to the
# round-numbered chipq_r4*.sh one-offs (VERDICT r4 #7; results of that round
# live in docs/CHIPQ_r4.txt).
#
# Usage:
#   tools/chipq.sh [leg-spec ...]
#
# Each leg-spec is "name" or "name:ENV=V[,ENV=V...]", e.g.
#   tools/chipq.sh base vmem64:VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536
# No specs => a single "base" leg (plain `python bench.py` defaults).
# A comma starts a NEW assignment only before an UPPERCASE name (the repo's
# env-var convention); commas inside values survive — so multi-flag XLA
# bundles work, because XLA flag names are lowercase:
#   bundle:VQVAE_TPU_XLA_OPTS=xla_tpu_scoped_vmem_limit_kib=65536,xla_tpu_use_bundle_aware_cost_model_for_fusions=true
#
# Protocol (the shape that produced trustworthy round-4 numbers):
#   0. (VALIDATE=1) tools/validate_tpu.py first — no A/B leg may flip a
#      default unless on-chip kernel acceptance passes. Log -> $VALIDATE_MD.
#   1. Precompile every leg, <=3 concurrent (XLA_PYTHON_CLIENT_PREALLOCATE=
#      false; bench.py AOT precompile mode executes no step, so clients
#      coexist while the remote compile helper works in parallel).
#   2. Timed legs SERIALLY (one chip; timing must not contend), each hitting
#      the persistent compile cache from phase 1.
#   Results: ONE line per leg appended to $RESULTS (kept IN THE REPO —
#   round-3's /tmp results file did not survive the environment).
#
# Env knobs: RESULTS (default docs/CHIPQ.txt), LOGDIR, VALIDATE=1,
# VALIDATE_MD (default docs/VALIDATE.md), WAIT_PID (drain a running bench
# first), PRECOMPILE=0 (skip phase 1).

set -u
cd "$(dirname "$0")/.."
RESULTS=${RESULTS:-docs/CHIPQ.txt}
LOGDIR=${LOGDIR:-/tmp/chipq}
VALIDATE_MD=${VALIDATE_MD:-docs/VALIDATE.md}
mkdir -p "$LOGDIR" docs

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

LEGS=("$@")
[ ${#LEGS[@]} -eq 0 ] && LEGS=(base)
echo "=== chipq start $(date) legs: ${LEGS[*]}" >> "$RESULTS"

# ---- phase 0: on-chip kernel acceptance ------------------------------------
if [ "${VALIDATE:-0}" = "1" ]; then
  {
    echo "# TPU kernel acceptance ($(date -u +%Y-%m-%dT%H:%MZ))"
    echo
    echo "\`python tools/validate_tpu.py\` on the real chip:"
    echo
    echo '```'
  } > "$VALIDATE_MD"
  timeout 3600 python tools/validate_tpu.py >> "$VALIDATE_MD" 2> "$LOGDIR/validate.err"
  VRC=$?
  echo '```' >> "$VALIDATE_MD"
  echo "validate_tpu: rc=$VRC $(date +%T)" >> "$RESULTS"
  if [ $VRC -ne 0 ]; then
    echo "(rc=$VRC — see $LOGDIR/validate.err; default-flipping legs gated off)" >> "$VALIDATE_MD"
    # ENFORCE the gate: drop every leg that overrides env defaults (anything
    # with a ':' spec); bare-default legs (e.g. 'base') may still measure
    GATED=()
    for spec in "${LEGS[@]}"; do
      case "$spec" in
        *:*) echo "GATED (validate rc=$VRC): $spec" >> "$RESULTS" ;;
        *)   GATED+=("$spec") ;;
      esac
    done
    LEGS=(${GATED[@]+"${GATED[@]}"})
    if [ ${#LEGS[@]} -eq 0 ]; then
      echo "=== chipq aborted: validation failed and every leg flips a default" >> "$RESULTS"
      exit 1
    fi
  fi
fi

leg_env() { # leg-spec -> env assignments on stdout, one per line
  # Split on "," ONLY where an UPPERCASE NAME= follows: env vars here are
  # uppercase while XLA flag names are lowercase, so comma-separated flag
  # bundles inside one value (the historical chipq_r4 bundle legs) stay whole.
  local spec="$1"
  case "$spec" in
    *:*) echo "${spec#*:}" | sed 's/,\([A-Z_][A-Z0-9_]*=\)/\n\1/g' ;;
  esac
}

run_bench() { # mode(pre|leg) name env...
  local mode="$1" name="$2"; shift 2
  local extra=(VQGAN_BENCH_SECONDARY=0 VQGAN_BENCH_WAIT_S="${CHIPQ_WAIT_S:-2400}")
  [ "$mode" = pre ] && extra+=(XLA_PYTHON_CLIENT_PREALLOCATE=false VQGAN_BENCH_PRECOMPILE=1)
  if [ "${CHIPQ_ECHO:-0}" = "1" ]; then  # parse smoke-test: print, don't run
    echo "RUN $mode $name :: ${extra[*]} $*" | tee -a "$LOGDIR/${mode}_$name.log"
    echo '{"smoke": true}' >> "$LOGDIR/${mode}_$name.log"
    return 0
  fi
  env "${extra[@]}" "$@" timeout 4200 python bench.py \
      > "$LOGDIR/${mode}_$name.log" 2>&1
}

# ---- phase 1: precompiles, <=3 concurrent ----------------------------------
if [ "${PRECOMPILE:-1}" = "1" ]; then
  n=0
  for spec in "${LEGS[@]}"; do
    name="${spec%%:*}"
    mapfile -t envs < <(leg_env "$spec")
    ( run_bench pre "$name" ${envs[@]+"${envs[@]}"}
      echo "precompile $name: rc=$? $(date +%T)" >> "$RESULTS" ) &
    n=$((n + 1))
    [ $((n % 3)) -eq 0 ] && wait
  done
  wait
fi

# ---- phase 2: timed legs, serial --------------------------------------------
for spec in "${LEGS[@]}"; do
  name="${spec%%:*}"
  mapfile -t envs < <(leg_env "$spec")
  run_bench leg "$name" ${envs[@]+"${envs[@]}"}
  line=$(grep -a '^{' "$LOGDIR/leg_$name.log" | tail -1)
  echo "$name: ${line:-FAILED_OR_TIMEOUT}" >> "$RESULTS"
done
echo "=== chipq done $(date)" >> "$RESULTS"
