"""Conv ResNet encoder / decoder, TPU-native (NHWC, bf16 compute / fp32 params).

Behavioral parity with the reference autoencoder (reference
vqvae/modules/autoencoder.py:7-180), re-designed for XLA on TPU:

- NHWC layout end-to-end: TPU convolutions tile onto the MXU in NHWC; there is
  no channels-first anywhere in this framework.
- All convolutions run in a configurable compute dtype (bfloat16 by default on
  TPU) with float32 parameters; GroupNorm statistics are always computed in
  float32 (the reference keeps fp32 master weights under AMP `16-mixed`).
- GroupNorm uses the *unbiased* variance estimator, matching the reference's
  custom implementation (autoencoder.py:31 uses `torch.var`, whose default is
  the unbiased/corrected estimator — unlike standard GroupNorm).
- Downsample = 2x2 average pool (autoencoder.py:80-91); Upsample =
  nearest-exact x2 + 3x3 conv (autoencoder.py:94-106); spatial compression
  factor = 2 ** len(channel_multipliers).
- Parameter init mirrors torch Conv2d defaults (kaiming-uniform a=sqrt(5) =>
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernels and biases) so training
  dynamics match the reference recipe.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Conv2d default weight init.

    kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with
    fan_in = in_channels * kh * kw. Flax kernel shape is (kh, kw, in, out).
    """
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_bias_init_for(fan_in: int):
    """torch.nn.Conv2d / Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """3x3/1x1 'same' convolution with torch-default init, NHWC.

    ``pad_features``: compute the conv with the output channels zero-padded
    to this many lanes, then slice back to ``features``. Used for the
    decoder's final C=3 conv (reference autoencoder.py:178 to_rgb), whose
    3-channel output tail under-fills the TPU's 8-sublane register tiles in
    the forward AND gives the backward a 3-channel cotangent for both
    transpose convs. The padded channels are identically zero — the math
    is unchanged — but the channel count changes how XLA tiles/reassociates
    the conv reductions, so outputs/gradients are equivalent to fp32
    rounding, not bit-exact (pinned by test_pad_conv_out_exact). Parameter
    shapes and checkpoint paths (conv_out/Conv_0/{kernel,bias}) unchanged.
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    pad_features: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        bias_init = conv_bias_init_for(in_ch * k * k)
        if self.pad_features is not None and self.pad_features > self.features:
            return _PaddedOutConv(
                features=self.features, pad_to=self.pad_features,
                kernel_size=(k, k), use_bias=self.use_bias, dtype=self.dtype,
                kernel_init=conv_kernel_init, bias_init=bias_init,
                name="Conv_0")(x)
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(1, 1),
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=conv_kernel_init,
            bias_init=bias_init,
        )(x)


class _PaddedOutConv(nn.Module):
    """nn.Conv-compatible 'same' conv computed at ``pad_to`` output lanes.

    Declares the SAME params as the nn.Conv it replaces (kernel
    (kh,kw,in,features) fp32, bias (features,)) under the same module name,
    pads both with zeros to ``pad_to`` channels for the compute, and slices
    the result. See Conv.pad_features for the rationale/exactness argument.
    """

    features: int
    pad_to: int
    kernel_size: tuple
    use_bias: bool
    dtype: Dtype
    kernel_init: Any
    bias_init: Any

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, in_ch, self.features), jnp.float32)
        pad = self.pad_to - self.features
        kp = jnp.pad(kernel, ((0, 0), (0, 0), (0, 0), (0, pad)))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kp.astype(self.dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", self.bias_init,
                              (self.features,), jnp.float32)
            y = y + jnp.pad(bias, (0, pad)).astype(self.dtype)
        return y[..., :self.features]


class GroupNorm(nn.Module):
    """GroupNorm with unbiased variance, fp32 statistics.

    Parity: reference autoencoder.py:7-39 (custom GroupNorm with explicit
    mean/var; torch.var default correction=1 => unbiased).
    """

    num_groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if c % self.num_groups != 0:
            raise ValueError("num_channels must be divisible by num_groups")

        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        xf = x.astype(jnp.float32)
        g = self.num_groups
        n = (c // g) * h * w  # elements per (batch, group)
        xg = xf.reshape(b, h, w, g, c // g)
        mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
        centered = xg - mean
        # unbiased variance (correction = 1), matching torch.var default
        var = jnp.sum(centered * centered, axis=(1, 2, 4), keepdims=True) / max(n - 1, 1)
        xg = centered * jax.lax.rsqrt(var + self.eps)
        xf = xg.reshape(b, h, w, c)
        xf = xf * scale + bias
        return xf.astype(self.dtype)


def _gn_silu_plain(x, scale, bias, num_groups, eps, out_dtype):
    """GroupNorm (unbiased var, fp32 stats) -> SiLU, the exact op sequence of
    GroupNorm.__call__ + nn.silu. Shared by the plain path and the fused
    forward so the two are bit-identical."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    g = num_groups
    n = (c // g) * h * w
    xg = xf.reshape(b, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    centered = xg - mean
    var = jnp.sum(centered * centered, axis=(1, 2, 4), keepdims=True) / max(n - 1, 1)
    inv = jax.lax.rsqrt(var + eps)
    xg = centered * inv
    xf = xg.reshape(b, h, w, c)
    xf = xf * scale + bias
    y = xf.astype(out_dtype)
    return nn.silu(y), (mean, inv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_silu_core(x, scale, bias, num_groups, eps, out_dtype):
    return _gn_silu_plain(x, scale, bias, num_groups, eps, out_dtype)[0]


def _gn_silu_fwd(x, scale, bias, num_groups, eps, out_dtype):
    out, (mean, inv) = _gn_silu_plain(x, scale, bias, num_groups, eps, out_dtype)
    # save the INPUT + tiny per-(batch,group) stats; x-hat, the GN output and
    # the silu value are all recomputed in the backward — this removes the
    # autodiff path's full-size saved residuals (fp32 centered tensor + the
    # GN output kept for the silu VJP), the dominant HBM traffic of the
    # norm backward at 256^2 (PERFORMANCE.md "GN-bwd fusions at 620-700 GB/s")
    return out, (x, scale, bias, mean, inv)


def _gn_silu_bwd(num_groups, eps, out_dtype, res, ct):
    x, scale, bias, mean, inv = res
    b, h, w, c = x.shape
    g = num_groups
    cg = c // g
    n = cg * h * w

    xg = x.astype(jnp.float32).reshape(b, h, w, g, cg)
    xhat = (xg - mean) * inv                         # recomputed
    xhat_f = xhat.reshape(b, h, w, c)
    y = xhat_f * scale + bias                        # GN output (fp32)

    # silu' in fp32 (the plain path differentiates silu in the compute dtype;
    # fp32 here is the strictly more accurate rounding of the same value)
    s = jax.nn.sigmoid(y)
    dy = ct.astype(jnp.float32) * s * (1.0 + y * (1.0 - s))

    dscale = jnp.sum(dy * xhat_f, axis=(0, 1, 2))
    dbias = jnp.sum(dy, axis=(0, 1, 2))

    # GN input gradient with the unbiased-variance correction:
    #   dx = inv * (dxhat - mean_g(dxhat) - xhat * sum_g(dxhat*xhat)/(n-1))
    dxhat = (dy * scale).reshape(b, h, w, g, cg)
    m1 = jnp.mean(dxhat, axis=(1, 2, 4), keepdims=True)
    m2 = jnp.sum(dxhat * xhat, axis=(1, 2, 4), keepdims=True) / max(n - 1, 1)
    dx = inv * (dxhat - m1 - xhat * m2)
    return (dx.reshape(b, h, w, c).astype(x.dtype),
            dscale.astype(scale.dtype), dbias.astype(bias.dtype))


_gn_silu_core.defvjp(_gn_silu_fwd, _gn_silu_bwd)


class GNSiLU(nn.Module):
    """Fused GroupNorm -> SiLU with a hand-written VJP.

    Forward math is bit-identical to ``nn.silu(GroupNorm(...)(x))`` (shared
    helper); the backward recomputes x-hat / the silu input from the saved
    input + per-group stats instead of materializing them. Parameter
    names/paths match GroupNorm exactly (scale/bias), so checkpoints are
    unaffected.

    MEASURED OFF by default: on v5e at the 256^2 flagship the recompute
    backward is ~1.2% SLOWER than XLA's autodiff composition (86.2 vs 87.3
    img/s) — the extra transcendental recompute (sigmoid for silu') and the
    second read of x outweigh the residual-traffic saving; XLA's GN-bwd
    fusions already run at 620-700 GB/s (PERFORMANCE.md). Kept behind
    ``VQVAE_TPU_GN_FUSED=1`` for future hardware where the VPU:HBM balance
    differs; gradient parity pinned by test_gn_silu_fused."""

    num_groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        if c % self.num_groups != 0:
            raise ValueError("num_channels must be divisible by num_groups")
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if os.environ.get("VQVAE_TPU_GN_FUSED", "0") != "1":
            return _gn_silu_plain(x, scale, bias, self.num_groups, self.eps,
                                  jnp.dtype(self.dtype))[0]
        return _gn_silu_core(x, scale, bias, self.num_groups, self.eps,
                             jnp.dtype(self.dtype))


def _avg_pool_2x2(x):
    """2x2/stride-2 average pool as reshape + same-dtype sum.

    Exact for non-overlapping windows. The forward avoids jnp.mean's f32
    upcast of the windowed tensor; the backward is a single broadcast (XLA's
    reduce-window gradient emits large standalone broadcasts, and the
    strided four-slice form profiled 4x worse — its backward pad-scatters
    the full tensor once per phase). Shared by the Downsample module and the
    fold_pool shortcut path."""
    b, h, w, c = x.shape
    xw = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.sum(xw, axis=(2, 4), dtype=x.dtype) * 0.25


class _KernelLeaf(nn.Module):
    """Bias-free kernel param matching nn.Conv's layout, so folded convs keep
    the conv2/Conv_0/kernel checkpoint path of the unfolded form."""

    features: int

    @nn.compact
    def __call__(self, in_ch: int):
        return self.param("kernel", conv_kernel_init,
                          (3, 3, in_ch, self.features), jnp.float32)


class _ConvKernel(nn.Module):
    features: int

    @nn.compact
    def __call__(self, in_ch: int):
        return _KernelLeaf(self.features, name="Conv_0")(in_ch)


# Folding a 3x3 'SAME' correlation with an adjacent nearest/box 2x2 resample
# into one conv: per axis the 4-tap kernel is K4 = T @ w3 with:
_UPSAMPLE_FOLD_T = np.array([[1, 0, 0],
                             [1, 1, 0],
                             [0, 1, 1],
                             [0, 0, 1]], np.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _up_conv_folded(x, k4, dtype):
    """lhs_dilation=2 'folded upsample' conv with a hand-picked backward.

    Forward: identical to the plain base-dilated conv (the replicated tensor
    is never materialized). Backward: XLA's AD of the lhs-dilated form emits
    a full-resolution spatial `reverse` of the output cotangent feeding each
    weight-grad (profiled ~2.2 ms/step across the decoder's four upsamples at
    256^2 b32). Here the weight grad is computed instead as four per-output-
    parity plain 2x2-kernel convolutions — for output phase q=(qa,qb),
    y[2i+qa, 2j+qb] = sum_{r,s} x[i+qa-1+r, j+qb-1+s] * k4[qa+2r, qb+2s] —
    whose standard (stride-1, no-dilation) weight-grad lowering needs no
    reverse; the input grad is the equivalent plain stride-2 conv with the
    spatially-flipped kernel. Exact (same taps, same sums)."""
    return jax.lax.conv_general_dilated(
        x.astype(dtype), k4.astype(dtype),
        window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _up_conv_folded_fwd(x, k4, dtype):
    return _up_conv_folded(x, k4, dtype), (x, k4)


def _up_conv_folded_bwd(dtype, res, ct):
    x, k4 = res
    k4c = k4.astype(dtype)
    # d/dx: plain stride-2 conv of the cotangent with the flipped kernel
    # (dx[i] = sum_k ct[2i+2-k] k4[k], k' = 3-k -> window 4, pad (1,1))
    dx = jax.lax.conv_general_dilated(
        ct, jnp.flip(k4c, (0, 1)).swapaxes(2, 3),
        window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # d/dk4: per output parity q, the cotangent phase slice pulls back
    # through a plain 2x2-kernel conv whose weight-grad lowering is the
    # standard (reverse-free) one
    dk4 = jnp.zeros(k4.shape, jnp.float32)
    xc = x.astype(dtype)
    for qa in (0, 1):
        for qb in (0, 1):
            kq = k4c[qa::2, qb::2]
            pad = ((1 - qa, qa), (1 - qb, qb))

            def phase(kk, _pad=pad):
                return jax.lax.conv_general_dilated(
                    xc, kk, window_strides=(1, 1), padding=_pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            _, pull = jax.vjp(phase, kq)
            (dkq,) = pull(ct[:, qa::2, qb::2])
            dk4 = dk4.at[qa::2, qb::2].set(dkq.astype(jnp.float32))
    return dx.astype(x.dtype), dk4.astype(k4.dtype)


_up_conv_folded.defvjp(_up_conv_folded_fwd, _up_conv_folded_bwd)


class ResBlock(nn.Module):
    """Pre-activation residual block: (GN -> SiLU -> 3x3 conv) x2, bias-free
    convs, optional 1x1 shortcut when channels change.

    Parity: reference autoencoder.py:42-77.

    ``fold_pool=True`` additionally applies the level's trailing 2x2 average
    pool (reference autoencoder.py:80-91) INSIDE the block, exactly:
    ``avgpool2(conv3x3(h)) == conv4x4_stride2(h)`` with the 4x4 kernel
    derived from the 3x3 by the same tap-merge transform as the decoder's
    upsample fold (box filter composed per axis), and
    ``avgpool2(conv1x1(x)) == conv1x1(avgpool2(x))`` on the shortcut. The
    residual add then happens at half resolution. Same parameters, same
    math, 4/9 the MXU work of the full-resolution conv2 + no standalone
    pool ops (profiled ~10 ms/step at 256^2 b32 across the encoder).
    """

    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32
    fold_pool: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out_ch = self.out_channels if self.out_channels is not None else in_ch

        residual = GNSiLU(dtype=self.dtype, name="norm1")(x)
        residual = Conv(out_ch, 3, use_bias=False, dtype=self.dtype, name="conv1")(residual)

        residual = GNSiLU(dtype=self.dtype, name="norm2")(residual)
        if self.fold_pool:
            w = _ConvKernel(out_ch, name="conv2")(residual.shape[-1])
            t = jnp.asarray(_UPSAMPLE_FOLD_T, jnp.float32)
            # per output pixel p: mean over d in {0,1}^2 of the 3x3 conv at
            # 2p+d  ==  4x4 taps K4 = 0.25 * (box2 x box2) * w3
            k4 = 0.25 * jnp.einsum("ad,be,dexy->abxy", t, t,
                                   w.astype(jnp.float32))
            residual = jax.lax.conv_general_dilated(
                residual.astype(self.dtype), k4.astype(self.dtype),
                window_strides=(2, 2),
                padding=((1, 2), (1, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = _avg_pool_2x2(x)
            if out_ch != in_ch:
                x = Conv(out_ch, 1, use_bias=False, dtype=self.dtype,
                         name="conv_shortcut")(x)
            return x + residual

        residual = Conv(out_ch, 3, use_bias=False, dtype=self.dtype, name="conv2")(residual)

        if out_ch != in_ch:
            x = Conv(out_ch, 1, use_bias=False, dtype=self.dtype, name="conv_shortcut")(x)

        return x + residual


class Downsample(nn.Module):
    """2x2 average pooling, stride 2 (reference autoencoder.py:80-91).

    See _avg_pool_2x2 for the reshape-based implementation rationale. Inside
    the Encoder this is folded into the preceding conv (ResBlock.fold_pool);
    the module remains as the standalone parity surface.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _avg_pool_2x2(x)


class _UpConvLeaf(nn.Module):
    """Parameter-only holder matching nn.Conv's param layout (kernel, bias) so
    Upsample's folded conv keeps the conv/Conv_0/{kernel,bias} checkpoint
    paths of the unfolded form."""

    features: int

    @nn.compact
    def __call__(self, in_ch: int):
        kernel = self.param("kernel", conv_kernel_init,
                            (3, 3, in_ch, self.features), jnp.float32)
        bias = self.param("bias", conv_bias_init_for(in_ch * 9),
                          (self.features,), jnp.float32)
        return kernel, bias


class _UpConvParams(nn.Module):
    features: int

    @nn.compact
    def __call__(self, in_ch: int):
        return _UpConvLeaf(self.features, name="Conv_0")(in_ch)


class Upsample(nn.Module):
    """Nearest-exact 2x upsample + 3x3 conv (reference autoencoder.py:94-106).

    For integer scale factors, torch 'nearest-exact' equals pixel replication.
    Instead of materializing the 2x-replicated tensor (4x the HBM traffic of
    the decoder's largest activation) and convolving it, the replication is
    folded into the conv: one lhs_dilation=2 convolution with the 3x3 kernel
    expanded to 4x4 by the exact tap-merge transform above — identical math,
    identical parameters/checkpoint layout, and XLA lowers the base-dilated
    conv to phased MXU work without writing the zeros.
    """

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w, b = _UpConvParams(self.channels, name="conv")(in_ch)

        t = jnp.asarray(_UPSAMPLE_FOLD_T, jnp.float32)
        k4 = jnp.einsum("ad,be,dexy->abxy", t, t, w.astype(jnp.float32))
        if os.environ.get("VQVAE_TPU_UPFOLD_VJP", "1") == "1":
            # reverse-free weight-grad formulation (see _up_conv_folded)
            y = _up_conv_folded(x, k4, jnp.dtype(self.dtype))
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), k4.astype(self.dtype),
                window_strides=(1, 1),
                padding=((2, 2), (2, 2)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return y + b.astype(self.dtype)


class Encoder(nn.Module):
    """Conv ResNet encoder (reference autoencoder.py:109-143).

    stem 3x3 -> per-multiplier [num_res_blocks ResBlocks + Downsample]
    -> num_res_blocks final ResBlocks -> GN -> SiLU -> 1x1 conv to
    embedding_dim. Output spatial = input / 2**len(channel_multipliers).

    ``remat=True`` checkpoints each ResBlock (recompute-in-backward): at
    256^2 the full-resolution activations dominate HBM, and trading ~1/3
    extra FLOPs for ~4x activation memory is the right call on 16 GB chips.
    """

    channels: int
    num_res_blocks: int
    channel_multipliers: Sequence[int]
    embedding_dim: int
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        block = nn.remat(ResBlock) if self.remat else ResBlock
        x = x.astype(self.dtype)
        x = Conv(self.channels, 3, use_bias=False, dtype=self.dtype, name="conv_in")(x)

        for i, mult in enumerate(self.channel_multipliers):
            ch_out = self.channels * mult
            for j in range(self.num_res_blocks):
                # the level's trailing 2x2 avg pool (reference Downsample,
                # autoencoder.py:80-91) is folded into the last block's conv2
                # as one stride-2 conv — exact, checkpoint-path-preserving
                last = j == self.num_res_blocks - 1
                x = block(ch_out, dtype=self.dtype, fold_pool=last,
                          name=f"down_{i}_block_{j}")(x)

        for j in range(self.num_res_blocks):
            x = block(dtype=self.dtype, name=f"final_block_{j}")(x)

        x = GNSiLU(dtype=self.dtype, name="norm_out")(x)
        x = Conv(self.embedding_dim, 1, use_bias=True, dtype=self.dtype, name="conv_out")(x)
        return x.astype(jnp.float32)


class Decoder(nn.Module):
    """Conv ResNet decoder, mirror of the encoder with final tanh
    (reference autoencoder.py:146-180).
    """

    channels: int
    num_res_blocks: int
    channel_multipliers: Sequence[int]
    embedding_dim: int  # input latent dim
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        block = nn.remat(ResBlock) if self.remat else ResBlock
        x = x.astype(self.dtype)
        n_levels = len(self.channel_multipliers)

        x = Conv(self.channels * self.channel_multipliers[-1], 3, use_bias=True,
                 dtype=self.dtype, name="conv_in")(x)

        for j in range(self.num_res_blocks):
            x = block(dtype=self.dtype, name=f"initial_block_{j}")(x)

        # mirror of the encoder: level i (from top) with ch_out =
        # channels * multipliers[i-1] for i > 0 else channels
        for i in reversed(range(n_levels)):
            ch_out = self.channels * self.channel_multipliers[i - 1] if i > 0 else self.channels
            for j in range(self.num_res_blocks):
                x = block(ch_out, dtype=self.dtype, name=f"up_{i}_block_{j}")(x)
            x = Upsample(ch_out, dtype=self.dtype, name=f"up_{i}_upsample")(x)

        x = GNSiLU(dtype=self.dtype, name="norm_out")(x)
        # pad-to-8 output lanes: opt-in pending an on-chip A/B (ROADMAP
        # candidate; ~1 ms estimate). Rounding-equivalent and checkpoint-
        # path-preserving; parity pinned by test_pad_conv_out_exact.
        pad = 8 if os.environ.get("VQVAE_TPU_PAD_CONV_OUT", "0") == "1" else None
        x = Conv(3, 3, use_bias=True, dtype=self.dtype, pad_features=pad,
                 name="conv_out")(x)
        return jnp.tanh(x.astype(jnp.float32))
