"""Import a reference PyTorch-Lightning checkpoint into this framework.

Converts the released `.ckpt` files (HF hub: SerezD/vqvae-vqgan-pytorch-
lightning, BASELINE.md) — or any checkpoint produced by the reference's
train.py — into an orbax eval checkpoint loadable by `evaluate.py
--loading_path`. This is the inference/eval parity bridge of SURVEY §7
step 4: the reference's published rFID/usage numbers can be reproduced
through this framework's eval stack without retraining.

Usage:
    python tools/import_torch_checkpoint.py \
        --ckpt /path/to/model.ckpt \
        --params_file example_confs/standard_vqvae.yaml \
        --output /ckpts/imported/

Requires torch (CPU build is enough) to unpickle the .ckpt; the tensor
layout conversion itself is numpy-only (vqvae_tpu/utils/torch_convert.py).
Lightning state_dict keys carry module prefixes from VQVAE attributes
(`encoder.*`, `decoder.*`, `quantizer.*`, reference model.py:126-149);
loss-stack weights (`criterion.*`) are dropped, mirroring evaluate.py's
load_loss=False (reference evaluate.py:48-49).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help=".ckpt / .pt state file")
    ap.add_argument("--params_file", required=True, help="matching YAML conf")
    ap.add_argument("--output", required=True, help="orbax checkpoint dir")
    args = ap.parse_args()

    import numpy as np
    import torch

    from vqvae_tpu.config import load_config
    from vqvae_tpu.utils.torch_convert import convert_vqvae_state_dict
    from vqvae_tpu.utils.checkpoint import save_eval_checkpoint

    cfg = load_config(args.params_file)

    blob = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()
          if not k.startswith("criterion.")}

    variables = convert_vqvae_state_dict(
        sd, cfg.quantizer.type,
        num_res_blocks=cfg.autoencoder.num_res_blocks,
        num_levels=len(cfg.autoencoder.channel_multipliers))

    n = sum(int(np.prod(x.shape)) for x in
            _leaves(variables["params"]))
    print(f"[INFO] converted {n / 1e6:.1f}M params "
          f"({cfg.quantizer.type} quantizer)")

    save_eval_checkpoint(args.output, variables)
    # self-describing import: the matching conf rides inside the snapshot dir
    # (orbax ignores the extra file) so downstream tooling — e.g.
    # tools/quality_parity.sh — can evaluate it without guessing the YAML
    import shutil
    shutil.copyfile(args.params_file, os.path.join(args.output, "conf.yaml"))
    print(f"[INFO] wrote orbax checkpoint to {args.output} — evaluate with:\n"
          f"  python evaluate.py --params_file {args.params_file} "
          f"--loading_path {args.output} ...")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
