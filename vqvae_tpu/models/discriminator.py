"""StyleGAN2 discriminator (resnet architecture), TPU-native.

Behavioral parity with the reference's vendored NVIDIA discriminator
(…/stylegan2_discriminator/discriminator.py:92-412) as instantiated by the
VQGAN loss — ``Discriminator(image_size)`` with defaults c_dim=0,
architecture='resnet', channel_base=32768, channel_max=512, num_fp16_res=0,
no conv_clamp (loss.py:69):

- per-resolution DiscriminatorBlock: fromrgb 1x1 (top res only), conv0 3x3,
  conv1 3x3 down=2 (gain sqrt(0.5)), 1x1 bias-free skip down=2 (gain
  sqrt(0.5)); [1,3,3,1] low-pass on every down-2 path
- equalized learning rate: unit-normal init, 1/sqrt(fan_in) runtime gains
- MinibatchStdLayer(group_size=4) — the source of the reference's
  batch-divisible-by-4 requirement (train.py:139-140)
- epilogue: mbstd -> conv 3x3 -> FC -> 1 logit

TPU re-design: NHWC layout; ``bias_act`` is a fused jnp expression (XLA fuses
it into the conv); the FIR down-2 paths go through
``vqvae_tpu.ops.conv2d_resample`` (depthwise FIR + strided dense conv).
All math in fp32 by default (matching num_fp16_res=0); a bf16 compute dtype
is available via ``dtype`` for throughput experiments.
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae_tpu.ops.bias_act import activation_funcs, bias_act
from vqvae_tpu.ops.conv2d_resample import conv2d_resample
from vqvae_tpu.ops.upfirdn2d import setup_filter

Dtype = Any

RESAMPLE_FILTER = (1, 3, 3, 1)


class FullyConnectedLayer(nn.Module):
    """Equalized-LR linear layer (reference discriminator.py:92-121)."""

    out_features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        w = self.param("weight",
                       lambda k, s: jax.random.normal(k, s) / self.lr_multiplier,
                       (in_features, self.out_features))
        b = (self.param("bias",
                        nn.initializers.constant(self.bias_init),
                        (self.out_features,))
             if self.use_bias else None)

        weight_gain = self.lr_multiplier / math.sqrt(in_features)
        w = (w * weight_gain).astype(self.dtype)
        if b is not None and self.lr_multiplier != 1.0:
            b = b * self.lr_multiplier

        x = jnp.matmul(x.astype(self.dtype), w,
                       preferred_element_type=self.dtype)
        return bias_act(x, b, act=self.activation)


class Conv2dLayer(nn.Module):
    """Equalized-LR conv with fused FIR resampling + bias_act
    (reference discriminator.py:127-174)."""

    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    conv_clamp: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, gain: float = 1.0, return_preact: bool = False,
                 pre_filtered: bool = False):
        in_channels = x.shape[-1]
        k = self.kernel_size
        w = self.param("weight", nn.initializers.normal(stddev=1.0),
                       (k, k, in_channels, self.out_channels))
        b = (self.param("bias", nn.initializers.zeros, (self.out_channels,))
             if self.use_bias else None)

        weight_gain = 1.0 / math.sqrt(in_channels * k * k)
        w = (w * weight_gain).astype(self.dtype)

        # fused-D-backward integration points (ops/fused_dbwd.py): the block
        # splits conv0's bias_act from its conv (return_preact) and hands
        # conv1 an already FIR-padded input (pre_filtered) so the
        # bias_act→blur span can carry one custom_vjp.
        if return_preact:
            # the fused chain rebuilt from (preact, bias) applies only
            # lrelu*def_gain — reject configurations it would silently drop
            assert self.up == 1 and self.down == 1 and k > 1
            assert self.conv_clamp is None and gain == 1.0
            x = conv2d_resample(x.astype(self.dtype), w, padding=k // 2,
                                flip_weight=True)
            return x, b
        if pre_filtered:
            assert self.down > 1 and self.up == 1
            from vqvae_tpu.ops.conv2d_resample import _conv2d
            # k==1: conv2d_resample's pointwise branch folds the down-2 into
            # the FIR itself, so the conv runs at stride 1; k>1: the FIR is
            # shape-preserving (pads+2) and the conv carries the stride
            x = _conv2d(x.astype(self.dtype), w,
                        stride=1 if k == 1 else self.down,
                        flip_weight=True)
            act_gain = activation_funcs[self.activation].def_gain * gain
            act_clamp = (self.conv_clamp * gain
                         if self.conv_clamp is not None else None)
            return bias_act(x, b, act=self.activation, gain=act_gain,
                            clamp=act_clamp)

        f = None
        if self.up > 1 or self.down > 1:
            # VQVAE_TPU_SEPARABLE_FIR=1 lowers the [1,3,3,1] low-pass as two
            # 1-D depthwise convs instead of one outer-product [4,4] conv —
            # half the FIR arithmetic, identical math (the filter is an outer
            # product); whether XLA's fusion landscape improves or a full-res
            # intermediate materializes is an empirical A/B (PERFORMANCE.md).
            separable = os.environ.get("VQVAE_TPU_SEPARABLE_FIR", "0") == "1"
            f = setup_filter(RESAMPLE_FILTER, separable=separable or None)

        x = conv2d_resample(x.astype(self.dtype), w, f=f, up=self.up,
                            down=self.down, padding=k // 2,
                            flip_weight=(self.up == 1))

        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=act_clamp)


class DiscriminatorBlock(nn.Module):
    """Residual down-2 block (reference discriminator.py:180-265).

    ``fused_dbwd=True`` re-expresses the conv0→blur→conv1 chain so the
    bias_act→FIR span runs under the fused-backward custom_vjp
    (ops/fused_dbwd.py): parameters, forward math and outputs are identical
    (pinned by test_fused_dbwd); only the compiled backward differs. NOT
    twice-differentiable — the R1 step uses the plain module.
    """

    tmp_channels: int
    out_channels: int
    has_fromrgb: bool
    activation: str = "lrelu"
    dtype: Dtype = jnp.float32
    fused_dbwd: bool = False
    fused_skip: bool = False

    @nn.compact
    def __call__(self, x, img):
        if self.has_fromrgb:
            y = Conv2dLayer(self.tmp_channels, 1, activation=self.activation,
                            dtype=self.dtype, name="fromrgb")(img)
            x = x + y if x is not None else y

        taps = [t / sum(RESAMPLE_FILTER) for t in RESAMPLE_FILTER]
        separable = os.environ.get("VQVAE_TPU_SEPARABLE_FIR", "0") == "1"
        # test hook: run the fused backwards through the interpret-mode
        # Pallas kernels on CPU, so the suite exercises the REAL kernel
        # dispatch (incl. its AD restrictions) without a TPU
        interp = os.environ.get("VQVAE_TPU_DBWD_INTERPRET", "0") == "1"
        skip_layer = Conv2dLayer(self.out_channels, 1, use_bias=False,
                                 down=2, dtype=self.dtype, name="skip")
        if self.fused_skip:
            # fan-out custom_vjp: the skip FIR's transpose and the x-input
            # cotangent ADD run as one Pallas pass in the backward
            from vqvae_tpu.ops.fused_dbwd import make_fused_skip_fanout
            fan = make_fused_skip_fanout(taps, separable=separable,
                                         interpret=interp)
            x, ys = fan(x.astype(self.dtype))
            skip = skip_layer(ys, gain=math.sqrt(0.5), pre_filtered=True)
        else:
            skip = skip_layer(x, gain=math.sqrt(0.5))

        conv0 = Conv2dLayer(self.tmp_channels, 3, activation=self.activation,
                            dtype=self.dtype, name="conv0")
        conv1 = Conv2dLayer(self.out_channels, 3, activation=self.activation,
                            down=2, dtype=self.dtype, name="conv1")
        if self.fused_dbwd and self.activation == "lrelu":
            from vqvae_tpu.ops.fused_dbwd import make_fused_act_blur
            p0, b0 = conv0(x, return_preact=True)
            spec = activation_funcs[self.activation]
            fused = make_fused_act_blur(taps, alpha=spec.def_alpha,
                                        gain=spec.def_gain,
                                        separable=separable,
                                        interpret=interp)
            x = conv1(fused(p0, b0), gain=math.sqrt(0.5), pre_filtered=True)
        else:
            x = conv0(x)
            x = conv1(x, gain=math.sqrt(0.5))
        return skip + x


def minibatch_std(x: jnp.ndarray, group_size: int = 4,
                  num_channels: int = 1) -> jnp.ndarray:
    """Append per-group feature stddev channel (reference
    discriminator.py:271-293). NHWC; batch must be divisible by group_size
    (or smaller than it).

    Matches the NVIDIA grouping exactly: reshape (N,) -> (G, N/G) makes group
    membership *strided* — sample b belongs to group b mod (N/G) together
    with samples b ± k*(N/G).
    """
    n, h, w, c = x.shape
    g = min(group_size, n) if group_size is not None else n
    f = num_channels
    cc = c // f

    y = x.reshape(g, n // g, h, w, f, cc).astype(jnp.float32)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)           # (n/g, h, w, f, cc)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 4))               # (n/g, f)
    y = y.astype(x.dtype)
    # out[r*(n/g) + i] = y[i]  (torch: y.repeat(G,1,H,W) tiles along batch)
    y = jnp.broadcast_to(y[None, :, None, None, :], (g, n // g, h, w, f))
    y = y.reshape(n, h, w, f)
    return jnp.concatenate([x, y], axis=-1)


class DiscriminatorEpilogue(nn.Module):
    """mbstd -> conv -> FC -> 1 logit (reference discriminator.py:299-354)."""

    in_channels: int
    resolution: int = 4
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32)
        if self.mbstd_num_channels > 0:
            x = minibatch_std(x, self.mbstd_group_size, self.mbstd_num_channels)
        x = Conv2dLayer(self.in_channels, 3, activation=self.activation,
                        name="conv")(x)
        # NHWC flatten; weight layouts differ from torch NCHW flatten but the
        # function class is identical (checkpoint converters permute).
        x = x.reshape(x.shape[0], -1)
        x = FullyConnectedLayer(self.in_channels, activation=self.activation,
                                name="fc")(x)
        return FullyConnectedLayer(1, name="out")(x)


class Discriminator(nn.Module):
    """Full-image StyleGAN2 discriminator (reference discriminator.py:360-412).

    channels per resolution = min(32768 / res, 512); blocks run from
    img_resolution down to 8, epilogue at 4.
    """

    img_resolution: int
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    activation: str = "lrelu"
    dtype: Dtype = jnp.float32
    remat: bool = False
    fused_dbwd: bool = False  # see DiscriminatorBlock; steps.py clones these
    fused_skip: bool = False  # on for the first-order GAN steps (env-gated)

    @nn.compact
    def __call__(self, img):
        res_log2 = int(math.log2(self.img_resolution))
        assert 2 ** res_log2 == self.img_resolution, "image size must be power of 2"
        block_resolutions = [2 ** i for i in range(res_log2, 2, -1)]
        channels = {res: min(self.channel_base // res, self.channel_max)
                    for res in block_resolutions + [4]}

        block_cls = nn.remat(DiscriminatorBlock) if self.remat else DiscriminatorBlock
        x = None
        for res in block_resolutions:
            x = block_cls(
                tmp_channels=channels[res],
                out_channels=channels[res // 2],
                has_fromrgb=(res == self.img_resolution),
                activation=self.activation,
                dtype=self.dtype,
                fused_dbwd=self.fused_dbwd,
                fused_skip=self.fused_skip,
                name=f"b{res}",
            )(x, img if res == self.img_resolution else None)

        return DiscriminatorEpilogue(channels[4], activation=self.activation,
                                     name="b4")(x)
