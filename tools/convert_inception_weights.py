"""Convert the standard FID inception weights (pt_inception-2015-12-05) to
this framework's format, folding BatchNorm into the convolutions.

Usage (with network, or with the .pth pre-fetched):
    python tools/convert_inception_weights.py [--pth pt_inception.pth] \
        [--out ~/.cache/vqvae_tpu/inception_fid.npz]

Source checkpoint: https://github.com/mseitzer/pytorch-fid/releases/download/
fid_weights/pt_inception-2015-12-05-6726825d.pth (the weights torchmetrics'
FrechetInceptionDistance uses — reference model.py:497).

BN fold (inference-exact): w' = w * g / sqrt(v + eps); b' = b - m * g /
sqrt(v + eps) with eps = 1e-3 (torchvision BasicConv2d).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

BN_EPS = 1e-3

URL = ("https://github.com/mseitzer/pytorch-fid/releases/download/"
       "fid_weights/pt_inception-2015-12-05-6726825d.pth")


def fold_conv_bn(sd: dict, prefix: str) -> dict:
    w = np.asarray(sd[f"{prefix}.conv.weight"], np.float64)  # (O,I,kh,kw)
    gamma = np.asarray(sd[f"{prefix}.bn.weight"], np.float64)
    beta = np.asarray(sd[f"{prefix}.bn.bias"], np.float64)
    mean = np.asarray(sd[f"{prefix}.bn.running_mean"], np.float64)
    var = np.asarray(sd[f"{prefix}.bn.running_var"], np.float64)

    scale = gamma / np.sqrt(var + BN_EPS)
    w_folded = w * scale[:, None, None, None]
    b_folded = beta - mean * scale
    return {
        "conv": {
            "kernel": np.transpose(w_folded, (2, 3, 1, 0)).astype(np.float32),
            "bias": b_folded.astype(np.float32),
        }
    }


# module name -> list of ConvBN child names (matching eval/inception.py)
BLOCKS = {
    "": ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1",
         "Conv2d_4a_3x3"],
    "Mixed_5b": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                 "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "Mixed_6a": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                 "branch3x3dbl_3"],
    "Mixed_6b": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "Mixed_7a": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                 "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"],
    "Mixed_7b": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                 "branch3x3dbl_3b", "branch_pool"],
}
BLOCKS["Mixed_5c"] = BLOCKS["Mixed_5d"] = BLOCKS["Mixed_5b"]
BLOCKS["Mixed_6c"] = BLOCKS["Mixed_6d"] = BLOCKS["Mixed_6e"] = BLOCKS["Mixed_6b"]
BLOCKS["Mixed_7c"] = BLOCKS["Mixed_7b"]


def convert(sd: dict) -> dict:
    params = {}
    for block, children in BLOCKS.items():
        if block == "":
            for child in children:
                params[child] = fold_conv_bn(sd, child)
        else:
            params[block] = {child: fold_conv_bn(sd, f"{block}.{child}")
                             for child in children}
    return params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pth", default=None,
                        help="local pt_inception .pth (downloads otherwise)")
    parser.add_argument("--out", default=str(
        Path.home() / ".cache" / "vqvae_tpu" / "inception_fid.npz"))
    args = parser.parse_args()

    import torch
    if args.pth:
        sd = torch.load(args.pth, map_location="cpu")
    else:
        sd = torch.hub.load_state_dict_from_url(URL, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items()}

    params = convert(sd)

    from vqvae_tpu.models.lpips import flatten_params
    flat = flatten_params(params)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **flat)
    print(f"wrote {out} ({len(flat)} arrays)")


if __name__ == "__main__":
    main()
