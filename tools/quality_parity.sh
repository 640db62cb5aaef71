#!/usr/bin/env bash
# ONE COMMAND from a connected machine to the closed quality-parity loop
# (VERDICT r4 #4): fetch + convert every pretrained artifact, import the
# released reference checkpoints (reference readme.md:144-145), evaluate
# them with THIS framework on ImageNet-1K validation, and assert
# rFID / codebook-usage / PSNR / SSIM / L2 / perplexity against the
# published table (readme.md:148-156) within the tolerances stated in
# tools/check_quality_parity.py.
#
#   tools/quality_parity.sh --dataset /path/to/imagenet   # (validation/ + test/
#                                                         #  subfolders, the
#                                                         #  data/dataset.py layout)
#       [--cache DIR]      artifact cache (default ~/.cache/vqvae_tpu)
#       [--runs LIST]      comma list matched against imported run names
#                          (default gumbel,entropy — the two released repros)
#       [--batch N]        eval batch (default 64)
#       [--dry-run FIXDIR] OFFLINE self-test: drives the identical chain on
#                          synthetic fixtures + a tiny synthetic dataset,
#                          no network, metric assertions skipped (exercised
#                          by tests/test_fetch_convert_runbook.py)
#
# Exit 0 = every released checkpoint reproduces its published numbers
# through this framework. Any metric outside tolerance = exit 1.

set -euo pipefail

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
CACHE="${HOME}/.cache/vqvae_tpu"
DATASET=""
RUNS="gumbel,entropy"
BATCH=64
FIXDIR=""

while [[ $# -gt 0 ]]; do
  case "$1" in
    --dataset) DATASET="$2"; shift 2 ;;
    --cache)   CACHE="$2"; shift 2 ;;
    --runs)    RUNS="$2"; shift 2 ;;
    --batch)   BATCH="$2"; shift 2 ;;
    --dry-run) FIXDIR="$2"; shift 2 ;;
    -h|--help) sed -n '2,24p' "$0"; exit 0 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

export PYTHONPATH="${REPO}${PYTHONPATH:+:$PYTHONPATH}"
PY="${PYTHON:-python3}"; command -v "$PY" >/dev/null || PY=python
OUTDIR="$CACHE/quality_parity"
mkdir -p "$OUTDIR"

# fail fast BEFORE the expensive fetch/convert/download stage
if [[ -z "$FIXDIR" ]]; then
  [[ -n "$DATASET" ]] || { echo "ERROR: --dataset is required" >&2; exit 2; }
  [[ -d "$DATASET/validation" && -d "$DATASET/test" ]] || {
    echo "ERROR: $DATASET must contain validation/ and test/ subfolders" \
         "(data/dataset.py layout)" >&2; exit 2; }
fi

echo "== [1/3] artifacts (LPIPS + inception + HF checkpoints) -> $CACHE"
if [[ -n "$FIXDIR" ]]; then
  bash "$REPO/tools/fetch_and_convert_all.sh" --cache "$CACHE" --dry-run "$FIXDIR"
else
  bash "$REPO/tools/fetch_and_convert_all.sh" --cache "$CACHE" --hf
fi

# point the framework's weight loaders at the cache regardless of its path
export VQVAE_TPU_LPIPS_WEIGHTS_DIR="$CACHE"
export VQVAE_TPU_INCEPTION_WEIGHTS="$CACHE/inception_fid.npz"

if [[ -n "$FIXDIR" ]]; then
  # offline self-test: tiny synthetic dataset; metric values are meaningless
  # (random-init fixture weights), so the checker is driven separately on
  # canned text by the test — here the EXECUTION of the full chain is pinned
  DATASET="$OUTDIR/dryrun_data"
  "$PY" - "$DATASET" <<'EOF'
import pathlib, sys
import numpy as np
from PIL import Image
for split, n in [("validation", 8), ("test", 8)]:
    d = pathlib.Path(sys.argv[1]) / split
    d.mkdir(parents=True, exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(n):
        Image.fromarray(rs.randint(0, 255, (16, 16, 3), np.uint8)).save(d / f"i{i}.png")
EOF
fi

echo "== [2/3] evaluate imported checkpoints from $CACHE/imported"
shopt -s nullglob
FAIL=0
FOUND=0
IFS=',' read -ra WANTED <<< "$RUNS"
for dir in "$CACHE"/imported/*/; do
  run_name="$(basename "$dir")"
  run_kind=""
  for w in "${WANTED[@]}"; do
    [[ "$run_name" == *"$w"* ]] && run_kind="$w"
  done
  if [[ -n "$FIXDIR" ]]; then
    run_kind="gumbel"   # dry-run fixture: exercise the chain, skip asserts
  elif [[ -z "$run_kind" ]]; then
    echo "   (skipping $run_name — not in --runs $RUNS)"; continue
  fi
  FOUND=1
  conf="$dir/conf.yaml"
  [[ -f "$conf" ]] || conf="$(ls "$dir"/*.yaml 2>/dev/null | head -1 || true)"
  [[ -f "$conf" ]] || { echo "ERROR: no conf YAML in $dir" >&2; exit 2; }
  log="$OUTDIR/eval_${run_name}.txt"
  echo "-- evaluating $run_name (conf $conf) -> $log"
  EXTRA=()
  [[ -n "$FIXDIR" ]] && EXTRA+=(--allow_missing_rfid)
  "$PY" "$REPO/evaluate.py" --params_file "$conf" --dataset_path "$DATASET" \
      --batch_size "$BATCH" --seed 42 --loading_path "$dir" \
      ${EXTRA[@]+"${EXTRA[@]}"} | tee "$log"

  echo "== [3/3] assert $run_name vs published table (readme.md:148-156)"
  if [[ -n "$FIXDIR" ]]; then
    # chain-execution pin only: the metrics must PARSE (values are random)
    "$PY" - "$log" <<'EOF'
import sys
from tools.check_quality_parity import parse_metrics  # via PYTHONPATH=$REPO
m = parse_metrics(open(sys.argv[1]).read())
assert {"mse", "psnr", "ssim", "used_codebook", "perplexity"} <= set(m), m
print("dry-run: metric lines parse ->", m)
EOF
  else
    "$PY" "$REPO/tools/check_quality_parity.py" --run "$run_kind" \
        --metrics "$log" || FAIL=1
  fi
done

[[ "$FOUND" == 1 ]] || { echo "ERROR: nothing imported under $CACHE/imported \
(did fetch_and_convert_all.sh --hf succeed?)" >&2; exit 2; }
if [[ "$FAIL" == 1 ]]; then
  echo "QUALITY PARITY: AT LEAST ONE RUN FAILED (logs in $OUTDIR)" >&2
  exit 1
fi
echo "QUALITY PARITY: all runs reproduce readme.md:148-156 within tolerance."
