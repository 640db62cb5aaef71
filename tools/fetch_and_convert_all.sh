#!/usr/bin/env bash
# One-command runbook for a CONNECTED machine: fetch + convert every
# pretrained artifact this (offline) TPU box cannot download, so that the
# moment connectivity exists, quality-parity evaluation against the released
# reference checkpoints (reference readme.md:144-156, rFID 6.30/6.17) is a
# single copy-paste.
#
# Produces, under --cache (default ~/.cache/vqvae_tpu):
#   lpips_vgg.npz lpips_alex.npz lpips_squeeze.npz   (LPIPS backbones+lin heads)
#   inception_fid.npz                                 (FID pool3 extractor)
#   CHECKSUMS.sha256                                  (sha256 of all outputs)
# and with --hf additionally imports the HuggingFace reference checkpoints
# (SerezD/vqvae-vqgan-pytorch-lightning) into orbax eval snapshots under
# --cache/imported/<run>/.
#
# After running, copy the cache dir to the TPU box (same path, or point
# $VQVAE_TPU_LPIPS_WEIGHTS_DIR / $VQVAE_TPU_INCEPTION_WEIGHTS at it) and run:
#   python evaluate.py --params_file <conf> --dataset_path <imagenet> \
#       --batch_size 64 --seed 42 --loading_path <cache>/imported/<run>
#
# Offline self-test (exercised by tests/test_fetch_convert_runbook.py):
#   tools/fetch_and_convert_all.sh --dry-run <fixture_dir>
# where <fixture_dir> holds synthetic .pth fixtures
#   backbone_{vgg,alex,squeeze}.pth lin_{vgg,alex,squeeze}.pth pt_inception.pth
# and optionally model.ckpt + conf.yaml (checkpoint-import leg). The dry run
# performs NO network access but drives the exact converter invocations.

set -euo pipefail

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
CACHE="${HOME}/.cache/vqvae_tpu"
FIXDIR=""
DO_HF=0

while [[ $# -gt 0 ]]; do
  case "$1" in
    --cache)   CACHE="$2"; shift 2 ;;
    --hf)      DO_HF=1; shift ;;
    --dry-run) FIXDIR="$2"; shift 2 ;;
    -h|--help) sed -n '2,28p' "$0"; exit 0 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

mkdir -p "$CACHE"
export PYTHONPATH="${REPO}${PYTHONPATH:+:$PYTHONPATH}"
PY="${PYTHON:-python3}"
command -v "$PY" >/dev/null || PY=python

echo "== [1/3] LPIPS weights (vgg, alex, squeeze) -> $CACHE"
for net in vgg alex squeeze; do
  if [[ -n "$FIXDIR" ]]; then
    "$PY" "$REPO/tools/convert_lpips_weights.py" --net "$net" --out "$CACHE" \
      --backbone_pth "$FIXDIR/backbone_${net}.pth" \
      --lin_pth "$FIXDIR/lin_${net}.pth"
  else
    # downloads: torchvision backbone weights + richzhang v0.1 lin heads
    "$PY" "$REPO/tools/convert_lpips_weights.py" --net "$net" --out "$CACHE"
  fi
done

echo "== [2/3] FID inception weights -> $CACHE/inception_fid.npz"
if [[ -n "$FIXDIR" ]]; then
  "$PY" "$REPO/tools/convert_inception_weights.py" \
    --pth "$FIXDIR/pt_inception.pth" --out "$CACHE/inception_fid.npz"
else
  # downloads mseitzer/pytorch-fid pt_inception weights via torch.hub
  "$PY" "$REPO/tools/convert_inception_weights.py" \
    --out "$CACHE/inception_fid.npz"
fi

echo "== [3/3] reference checkpoints"
if [[ -n "$FIXDIR" ]]; then
  if [[ -f "$FIXDIR/model.ckpt" && -f "$FIXDIR/conf.yaml" ]]; then
    "$PY" "$REPO/tools/import_torch_checkpoint.py" \
      --ckpt "$FIXDIR/model.ckpt" --params_file "$FIXDIR/conf.yaml" \
      --output "$CACHE/imported/dryrun"
  else
    echo "   (dry run: no model.ckpt/conf.yaml fixtures — import leg skipped)"
  fi
elif [[ "$DO_HF" == 1 ]]; then
  # released reproductions: reference readme.md:144-145 points at
  # huggingface.co/SerezD/vqvae-vqgan-pytorch-lightning
  HF_DIR="$CACHE/hf_checkpoints"
  "$PY" - "$HF_DIR" <<'EOF'
import sys
from huggingface_hub import snapshot_download
snapshot_download("SerezD/vqvae-vqgan-pytorch-lightning",
                  local_dir=sys.argv[1])
print("downloaded ->", sys.argv[1])
EOF
  shopt -s nullglob
  for ckpt in "$HF_DIR"/*.ckpt "$HF_DIR"/**/*.ckpt; do
    run="$(basename "${ckpt%.ckpt}")"
    conf="$(dirname "$ckpt")/${run}.yaml"
    [[ -f "$conf" ]] || conf="$(dirname "$ckpt")/conf.yaml"
    if [[ -f "$conf" ]]; then
      "$PY" "$REPO/tools/import_torch_checkpoint.py" --ckpt "$ckpt" \
        --params_file "$conf" --output "$CACHE/imported/$run"
    else
      echo "   WARNING: no YAML next to $ckpt — import it manually with" \
           "tools/import_torch_checkpoint.py --params_file <conf>"
    fi
  done
else
  echo "   (pass --hf to download + import the released HF checkpoints)"
fi

echo "== checksums -> $CACHE/CHECKSUMS.sha256"
( cd "$CACHE" && find . -name '*.npz' -type f | sort \
    | xargs sha256sum > CHECKSUMS.sha256 && cat CHECKSUMS.sha256 )

echo "== done. Copy $CACHE to the TPU box (or set"
echo "   VQVAE_TPU_LPIPS_WEIGHTS_DIR=$CACHE and"
echo "   VQVAE_TPU_INCEPTION_WEIGHTS=$CACHE/inception_fid.npz)."
