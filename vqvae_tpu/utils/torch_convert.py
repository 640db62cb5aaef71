"""Convert reference (PyTorch) VQVAE checkpoints to this framework's params.

Used two ways:
1. Importing the released HF checkpoints for inference/eval parity
   (BASELINE.md: https://huggingface.co/SerezD/vqvae-vqgan-pytorch-lightning).
2. Test-time numerical parity: copy weights from freshly-built reference
   torch modules into flax params and compare forward outputs.

Layout mapping (reference is NCHW, this framework is NHWC):
- Conv2d weight (O, I, kh, kw)  ->  flax kernel (kh, kw, I, O)
- custom GroupNorm weight/bias (1, C, 1, 1)  ->  scale/bias (C,)
- nn.Embedding codebook (N, D)  ->  codebook (N, D) unchanged

Key layout of the reference modules: vqvae/modules/autoencoder.py:109-180
(Encoder.blocks / final_residual as nn.Sequential; Decoder.initial_residual /
blocks), vector_quantizers.py (codebook, ema buffers, gumbel x_to_logits).

Works on plain numpy arrays so it has no torch dependency — pass
``{k: np.asarray(v)}`` of the state_dict.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv_w(v: np.ndarray) -> np.ndarray:
    return np.transpose(v, (2, 3, 1, 0))


def _gn(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    return {
        "scale": sd[f"{prefix}.weight"].reshape(-1),
        "bias": sd[f"{prefix}.bias"].reshape(-1),
    }


def _conv(sd: Dict[str, np.ndarray], prefix: str, bias: bool = True) -> dict:
    out = {"kernel": _conv_w(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _resblock(sd, prefix: str) -> dict:
    out = {
        "norm1": _gn(sd, f"{prefix}.norm1"),
        "conv1": {"Conv_0": _conv(sd, f"{prefix}.conv1", bias=False)},
        "norm2": _gn(sd, f"{prefix}.norm2"),
        "conv2": {"Conv_0": _conv(sd, f"{prefix}.conv2", bias=False)},
    }
    if f"{prefix}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = {"Conv_0": _conv(sd, f"{prefix}.conv_shortcut", bias=False)}
    return out


def convert_encoder(sd: Dict[str, np.ndarray], num_res_blocks: int,
                    num_levels: int, prefix: str = "encoder") -> dict:
    """Reference Encoder state_dict -> flax Encoder params
    (autoencoder.py:109-143; Sequential index = level*(n+1)+j, Downsample
    occupies the (n+1)-th parameter-free slot)."""
    n = num_res_blocks
    params = {
        "conv_in": {"Conv_0": _conv(sd, f"{prefix}.conv_in", bias=False)},
        "norm_out": _gn(sd, f"{prefix}.norm"),
        "conv_out": {"Conv_0": _conv(sd, f"{prefix}.conv_out")},
    }
    for i in range(num_levels):
        for j in range(n):
            k = i * (n + 1) + j
            params[f"down_{i}_block_{j}"] = _resblock(sd, f"{prefix}.blocks.{k}")
    for j in range(n):
        params[f"final_block_{j}"] = _resblock(sd, f"{prefix}.final_residual.{j}")
    return params


def convert_decoder(sd: Dict[str, np.ndarray], num_res_blocks: int,
                    num_levels: int, prefix: str = "decoder") -> dict:
    """Reference Decoder state_dict -> flax Decoder params
    (autoencoder.py:146-180; blocks iterate levels in reversed(range(L)),
    each level = n ResBlocks + an Upsample with a 3x3 conv)."""
    n = num_res_blocks
    params = {
        "conv_in": {"Conv_0": _conv(sd, f"{prefix}.conv_in")},
        "norm_out": _gn(sd, f"{prefix}.norm"),
        "conv_out": {"Conv_0": _conv(sd, f"{prefix}.conv_out")},
    }
    for j in range(n):
        params[f"initial_block_{j}"] = _resblock(sd, f"{prefix}.initial_residual.{j}")
    # Sequential order: seq position p counts levels i = L-1, L-2, ..., 0
    for p, i in enumerate(reversed(range(num_levels))):
        for j in range(n):
            k = p * (n + 1) + j
            params[f"up_{i}_block_{j}"] = _resblock(sd, f"{prefix}.blocks.{k}")
        up_k = p * (n + 1) + n
        params[f"up_{i}_upsample"] = {
            "conv": {"Conv_0": _conv(sd, f"{prefix}.blocks.{up_k}.conv")}}
    return params


def convert_quantizer(sd: Dict[str, np.ndarray], q_type: str,
                      prefix: str = "quantizer"):
    """Reference quantizer state_dict -> (params, vq_state).

    standard/entropy: codebook is a trainable param. ema: codebook + EMA
    accumulators live in the ``vq_state`` collection. gumbel: codebook +
    1x1 x_to_logits conv (vector_quantizers.py:218).
    """
    cb = sd[f"{prefix}.codebook.weight"]
    if q_type == "ema":
        vq_state = {
            "codebook": cb,
            "ema_count": sd[f"{prefix}.ema_count"],
            "ema_weight": sd[f"{prefix}.ema_weight"],
        }
        return {}, vq_state
    params = {"codebook": cb}
    if q_type == "gumbel":
        params["x_to_logits_kernel"] = _conv_w(sd[f"{prefix}.x_to_logits.weight"])
        params["x_to_logits_bias"] = sd[f"{prefix}.x_to_logits.bias"]
    return params, None


def _eq_conv(sd: Dict[str, np.ndarray], prefix: str, bias: bool = True) -> dict:
    """Equalized-LR Conv2dLayer: raw weight (O,I,kh,kw) -> (kh,kw,I,O)."""
    out = {"weight": _conv_w(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _eq_fc(sd: Dict[str, np.ndarray], prefix: str,
           spatial: tuple = None) -> dict:
    """FullyConnectedLayer: weight (out,in) -> (in,out). When the torch layer
    consumed an NCHW flatten (C,H,W) and ours consumes NHWC (H,W,C), pass
    ``spatial=(C,H,W)`` to permute the input axis accordingly."""
    w = sd[f"{prefix}.weight"]
    if spatial is not None:
        c, h, ww = spatial
        w = w.reshape(-1, c, h, ww).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    out = {"weight": np.ascontiguousarray(w.T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def convert_discriminator_state_dict(sd: Dict[str, np.ndarray],
                                     img_resolution: int,
                                     channel_base: int = 32768,
                                     channel_max: int = 512) -> dict:
    """Reference StyleGAN2 Discriminator state_dict -> flax params
    (discriminator.py:360-412 layout: b{res} blocks + b4 epilogue)."""
    import math
    sd = {k: np.asarray(v) for k, v in sd.items()}
    res_log2 = int(math.log2(img_resolution))
    block_resolutions = [2 ** i for i in range(res_log2, 2, -1)]
    channels = {res: min(channel_base // res, channel_max)
                for res in block_resolutions + [4]}

    params = {}
    for res in block_resolutions:
        block = {
            "conv0": _eq_conv(sd, f"b{res}.conv0"),
            "conv1": _eq_conv(sd, f"b{res}.conv1"),
            "skip": _eq_conv(sd, f"b{res}.skip", bias=False),
        }
        if f"b{res}.fromrgb.weight" in sd:
            block["fromrgb"] = _eq_conv(sd, f"b{res}.fromrgb")
        params[f"b{res}"] = block

    c4 = channels[4]
    params["b4"] = {
        "conv": _eq_conv(sd, "b4.conv"),
        "fc": _eq_fc(sd, "b4.fc", spatial=(c4, 4, 4)),
        "out": _eq_fc(sd, "b4.out"),
    }
    return params


def convert_vqvae_state_dict(sd: Dict[str, np.ndarray], q_type: str,
                             num_res_blocks: int, num_levels: int) -> dict:
    """Full reference VQVAE state_dict -> flax variables dict
    ({'params': ..., 'vq_state': ...})."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "encoder": convert_encoder(sd, num_res_blocks, num_levels),
        "decoder": convert_decoder(sd, num_res_blocks, num_levels),
    }
    q_params, vq_state = convert_quantizer(sd, q_type)
    if q_params:
        params["quantizer"] = q_params
    variables = {"params": params}
    if vq_state is not None:
        variables["vq_state"] = {"quantizer": vq_state}
    return variables
