#!/bin/bash
# Sequential flagship-bench sweep over XLA compiler-option configs.
#
# The axon TPU tunnel has multi-hour outages; each config first waits for
# the chip (small-matmul probe) and then runs `bench.py`, appending one
# result line per config to $RESULTS. Run it detached:
#
#   nohup bash tools/bench_sweep.sh > /tmp/sweep.log 2>&1 &
#
# Configs are "name<TAB>opts" lines below; opts is the VQVAE_TPU_XLA_OPTS
# value ("" = framework default = scoped-vmem 64 MiB on TPU, "none" =
# disable). Results land in /tmp/bench_<name>.log + $RESULTS.

set -u
cd "$(dirname "$0")/.."
RESULTS=${RESULTS:-/tmp/sweep_results.txt}
echo "=== sweep start $(date)" >> "$RESULTS"

wait_tunnel() {
  while true; do
    timeout 240 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((512,512)) @ jnp.ones((512,512)))))
" >/dev/null 2>&1 && return 0
    sleep 120
  done
}

run_one() {
  local name="$1" opts="$2"
  wait_tunnel
  echo "--- $name (opts='$opts') start $(date)" >> "$RESULTS"
  VQGAN_BENCH_SECONDARY=${VQGAN_BENCH_SECONDARY:-0} \
    VQVAE_TPU_XLA_OPTS="$opts" timeout 3000 \
    python bench.py > "/tmp/bench_$name.log" 2>&1
  local line
  line=$(grep -a '^{' "/tmp/bench_$name.log" | tail -1)
  echo "$name: ${line:-FAILED_OR_TIMEOUT}" >> "$RESULTS"
}

run_one defaults ""
run_one novmem "none"
run_one f_bundle "xla_tpu_scoped_vmem_limit_kib=65536,xla_tpu_use_bundle_aware_cost_model_for_fusions=true"
run_one f_vmem80 "xla_tpu_scoped_vmem_limit_kib=81920"
echo "=== sweep done $(date)" >> "$RESULTS"
