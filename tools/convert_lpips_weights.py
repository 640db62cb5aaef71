"""One-time conversion of LPIPS pretrained weights to this framework's format.

Sources (reference …/lpips_pytorch/modules/networks.py:67-97, utils.py:11-30):
- backbone: torchvision VGG16 (VGG16_Weights.DEFAULT) or AlexNet `.features`
- lin heads: richzhang/PerceptualSimilarity v0.1 {vgg,alex}.pth

Usage (on a machine with torchvision + network, or with the files pre-fetched):
    python tools/convert_lpips_weights.py --net vgg [--out ~/.cache/vqvae_tpu/]
    python tools/convert_lpips_weights.py --net vgg \
        --backbone_pth vgg16_features.pth --lin_pth vgg.pth

Produces lpips_<net>.npz with flat 'a/b/c'-keyed arrays consumed by
vqvae_tpu.models.lpips.init_lpips. Conversion: torch conv (O,I,kh,kw) ->
flax (kh,kw,I,O); lin heads (1,C,1,1) -> (C,1).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def convert_backbone_vgg(sd: dict) -> dict:
    """torchvision vgg16 .features state_dict -> flax VGG16Features params."""
    conv_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params = {}
    for i, idx in enumerate(conv_indices):
        params[f"conv{i}"] = {
            "kernel": np.transpose(sd[f"{idx}.weight"], (2, 3, 1, 0)),
            "bias": sd[f"{idx}.bias"],
        }
    return params


def convert_backbone_alex(sd: dict) -> dict:
    conv_indices = [0, 3, 6, 8, 10]
    params = {}
    for i, idx in enumerate(conv_indices):
        params[f"conv{i}"] = {
            "kernel": np.transpose(sd[f"{idx}.weight"], (2, 3, 1, 0)),
            "bias": sd[f"{idx}.bias"],
        }
    return params


def convert_backbone_squeeze(sd: dict) -> dict:
    """torchvision squeezenet1_1 .features state_dict -> flax
    SqueezeNetFeatures params (conv0 + fire1..fire8, reference
    networks.py:67-74 layer layout)."""

    def conv(prefix):
        return {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0)),
                "bias": sd[f"{prefix}.bias"]}

    params = {"conv0": conv("0")}
    # Fire modules sit at feature indices 3,4 / 6,7 / 9,10,11,12
    for i, idx in enumerate([3, 4, 6, 7, 9, 10, 11, 12], start=1):
        params[f"fire{i}"] = {
            "squeeze": conv(f"{idx}.squeeze"),
            "expand1x1": conv(f"{idx}.expand1x1"),
            "expand3x3": conv(f"{idx}.expand3x3"),
        }
    return params


_BACKBONE_CONVERTERS = {
    "vgg": convert_backbone_vgg,
    "alex": convert_backbone_alex,
    "squeeze": convert_backbone_squeeze,
}
_N_LIN_LAYERS = {"vgg": 5, "alex": 5, "squeeze": 7}


def convert_lin_heads(sd: dict, n_layers: int) -> dict:
    """richzhang lin heads: keys like 'lin0.model.1.weight' (1,C,1,1)."""
    out = {}
    for i in range(n_layers):
        key = next(k for k in sd if k.startswith(f"lin{i}.") or k == f"{i}.1.weight")
        w = np.asarray(sd[key])
        out[f"lin{i}"] = w.reshape(w.shape[1], 1)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--net", choices=["vgg", "alex", "squeeze"],
                        required=True)
    parser.add_argument("--out", default=str(Path.home() / ".cache" / "vqvae_tpu"))
    parser.add_argument("--backbone_pth", default=None,
                        help="optional local .pth of the torchvision "
                             "backbone features state_dict")
    parser.add_argument("--lin_pth", default=None,
                        help="optional local .pth of the richzhang lin heads")
    args = parser.parse_args()

    import torch

    if args.backbone_pth:
        backbone_sd = torch.load(args.backbone_pth, map_location="cpu")
    else:
        from torchvision import models
        if args.net == "vgg":
            net = models.vgg16(weights=models.VGG16_Weights.DEFAULT).features
        elif args.net == "alex":
            net = models.alexnet(weights=models.AlexNet_Weights.DEFAULT).features
        else:
            net = models.squeezenet1_1(
                weights=models.SqueezeNet1_1_Weights.DEFAULT).features
        backbone_sd = net.state_dict()
    backbone_sd = {k: v.numpy() for k, v in backbone_sd.items()}

    if args.lin_pth:
        lin_sd = torch.load(args.lin_pth, map_location="cpu")
    else:
        url = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
               f"master/lpips/weights/v0.1/{args.net}.pth")
        lin_sd = torch.hub.load_state_dict_from_url(url, map_location="cpu")
    lin_sd = {k: v.numpy() for k, v in lin_sd.items()}

    params = {"net": _BACKBONE_CONVERTERS[args.net](backbone_sd)}
    params.update(convert_lin_heads(lin_sd, _N_LIN_LAYERS[args.net]))

    from vqvae_tpu.models.lpips import flatten_params
    flat = flatten_params(params)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / f"lpips_{args.net}.npz"
    np.savez(out_path, **flat)
    print(f"wrote {out_path} ({len(flat)} arrays)")


if __name__ == "__main__":
    main()
