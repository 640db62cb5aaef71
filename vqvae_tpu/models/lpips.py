"""LPIPS perceptual distance in flax (VGG16 / AlexNet backbones).

Parity with the reference's vendored lpips-pytorch
(vqvae/modules/loss/lpips_pytorch/, 4 files):

- backbone feature taps: VGG16 after relu{1_2,2_2,3_3,4_3,5_3}
  (networks.py:94, target layers [4,9,16,23,30]); AlexNet after each of its 5
  ReLUs (networks.py:83, [2,5,8,10,12])
- input z-scored with shift (-.030,-.088,-.188) / scale (.458,.448,.450)
  (networks.py:42-52) — inputs are in (-1, 1)
- per-layer unit-normalization over channels (utils.py:6-8)
- frozen 1x1 'lin' heads, distance = batch-mean of summed per-layer
  spatially-averaged weighted squared diffs (lpips.py:31-38)

Pretrained torchvision backbone + richzhang lin-head weights are converted
once by ``tools/convert_lpips_weights.py`` into an .npz loaded here. In a
hermetic environment without the pretrained files, ``init_lpips`` falls back
to architecture-correct random parameters (useful for pipeline/throughput
work; quality runs require the converted weights — the loader warns).

All LPIPS parameters are frozen: they live outside every optimizer, passed to
the loss as a constant pytree (the reference reaches the same state via
requires_grad=False, networks.py:33-35).
"""

from __future__ import annotations

import functools
import os
import warnings
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# z-score buffers (reference networks.py:42-52)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

VGG16_CHANNELS = (64, 128, 256, 512, 512)
ALEX_CHANNELS = (64, 192, 384, 256, 256)
SQUEEZE_CHANNELS = (64, 128, 256, 384, 384, 512, 512)


def _normalize_activation(x, eps=1e-10, out_dtype=jnp.float32):
    """Channel-unit-normalize (reference utils.py:6-8). Statistics in fp32;
    the (large, saved-for-backward) result is stored in ``out_dtype`` — bf16
    under the training compute policy halves the HBM traffic of the taps.

    Hand-written VJP (vs autodiff of x/(sqrt(sum x^2)+eps)):
    - keeps every full-resolution tensor in the compute dtype through the
      reverse pass — the autodiff transpose of the fp32-division form
      materialized ~6 fp32 copies of the largest tap and dragged the VGG
      conv1 transpose fusion to 280 GB/s (profiled 5.2 ms/step at 256^2 b32);
    - is finite at all-zero pixels: autodiff pulls d sqrt(0) = inf into an
      inf*0=NaN for pixels where every channel is exactly 0 (post-ReLU this
      happens with random-init fallback weights; the torch reference has the
      same latent NaN). Here the zero cotangent-projection cancels first.

        y = x * g,  g = 1/(sqrt(ss)+eps),  ss = sum_c x^2
        dx = g*ct - x * (sum_c ct*x) * g^2 / max(sqrt(ss), tiny)
    """
    return _normalize_core(x, float(eps), jnp.dtype(out_dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _normalize_core(x, eps, out_dtype):
    ss = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    inv = 1.0 / (jnp.sqrt(ss) + eps)
    return (x * inv.astype(x.dtype)).astype(out_dtype)


def _normalize_core_fwd(x, eps, out_dtype):
    ss = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    rt = jnp.sqrt(ss)
    inv = 1.0 / (rt + eps)
    y = (x * inv.astype(x.dtype)).astype(out_dtype)
    return y, (x, rt, inv)


def _normalize_core_bwd(eps, out_dtype, res, ct):
    x, rt, inv = res
    ctc = ct.astype(x.dtype)
    # channel reduce in fp32 (in-register upcast inside the fused reduce)
    t = jnp.sum(ctc.astype(jnp.float32) * x.astype(jnp.float32),
                axis=-1, keepdims=True)
    scale = t * inv * inv / jnp.maximum(rt, 1e-20)
    dx = ctc * inv.astype(x.dtype) - x * scale.astype(x.dtype)
    return (dx,)


_normalize_core.defvjp(_normalize_core_fwd, _normalize_core_bwd)


def lpips_tapvjp_default() -> bool:
    """Resolve the fused tap-score toggle (env VQVAE_TPU_LPIPS_TAPVJP=1).

    When ON, each layer's weighted-squared-diff score runs through
    ``_tap_score``: a custom_vjp that saves the tap DIFFERENCE as its only
    full-resolution residual instead of letting autodiff keep BOTH normalized
    taps alive to the backward. Per tap the backward then reads one large
    tensor (d) where the autodiff form read two (fx, fy) — ~0.5 GB/step less
    HBM traffic at 256^2 b32, concentrated in the stage-1 transpose fusions
    that profile at 290 GB/s (PERFORMANCE.md round-4 profile). Default OFF
    until the on-chip A/B lands (measured-win rule)."""
    return os.environ.get("VQVAE_TPU_LPIPS_TAPVJP", "0") == "1"


@jax.custom_vjp
def _tap_score(fx, fy, lin):
    """Per-sample weighted squared tap distance (B,), fp32.

    Primal is bit-identical to the module form
    ``mean(einsum("bhwc,co->bhwo", (fx-fy)**2, lin), axis=(1,2,3))``
    with the einsum accumulating fp32 over ``lin`` cast to the tap dtype."""
    d = fx - fy
    w = jnp.einsum("bhwc,co->bhwo", d * d, lin.astype(d.dtype),
                   preferred_element_type=jnp.float32)
    return jnp.mean(w, axis=(1, 2, 3))


def _tap_score_fwd(fx, fy, lin):
    d = fx - fy
    w = jnp.einsum("bhwc,co->bhwo", d * d, lin.astype(d.dtype),
                   preferred_element_type=jnp.float32)
    return jnp.mean(w, axis=(1, 2, 3)), (d, lin)


def _tap_score_bwd(res, ct):
    d, lin = res
    _, h, w, _ = d.shape
    scale = (ct.astype(jnp.float32) / (h * w))[:, None, None, None]
    lin_vec = lin[:, 0].astype(jnp.float32)
    ct_fy = (-2.0 * d.astype(jnp.float32) * lin_vec * scale)
    # frozen in training (LPIPS params live in no optimizer) but defined for
    # generality; DCE'd whenever lin carries no cotangent
    d_lin = jnp.einsum("bhwc,bhwo->co", jnp.square(d.astype(jnp.float32)),
                       jnp.broadcast_to(scale, (*d.shape[:3], 1)))
    return ((-ct_fy).astype(d.dtype), ct_fy.astype(d.dtype),
            d_lin.astype(lin.dtype))


_tap_score.defvjp(_tap_score_fwd, _tap_score_bwd)


def _max_pool_2x2(x):
    """Non-overlapping 2x2/stride-2 max pool as reshape + max (exact).

    Avoids XLA's reduce-window path whose gradient lowers to
    select-and-scatter — profiled as the single most expensive HLO in the
    LPIPS backward at 256^2. The reshape form differentiates to a fused
    compare/select chain instead.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.max(x, axis=(2, 4))


# ---------------------------------------------------------------------------
# W-polyphase stage 1 (VGG): C=64 tensors at 256^2 are physically padded to
# the 128-wide lane tile (layout T(8,128)), so every stage-1 op runs at half
# the effective HBM bandwidth (profiled 276-362 GB/s vs 640-700 for C=128
# tensors — ~23 ms/step of the GAN step). Merging adjacent W-pixel PAIRS into
# channels makes every stage-1 tensor a dense [B, H, W/2, 128]:
#
#   X[b, h, j, p*64 + c] = x[b, h, 2j + p, c]        (a pure reshape)
#
# The two 3x3 convs become ONE conv each on the poly form with exactly
# rearranged kernels (conv1_1: stride-(1,2) window (3,4); conv1_2: window
# (3,3) over W-blocks with a half-dense 128->128 channel matrix — 2x the
# MACs of the 64->64 conv but at dense-MXU rates, where the C=64 conv was
# measured at 35-75 of 197 TFLOP/s). Channel unit-normalization becomes a
# per-64-group norm, and the 2x2 max pool becomes an H-slice max + a max of
# the two phase channel-halves. All exact (same taps, same distance).
# ---------------------------------------------------------------------------


def _poly_kernel_stem(k):
    """[3,3,ci,co] SAME/stride-1 kernel -> [3,4,ci,2co] stride-(1,2) kernel
    producing the W-polyphase output directly: output block j, phase q reads
    w = 2j+q+dw for dw in {-1,0,1}; with W padding (1,2) the window position
    is kw = q+dw+1."""
    kh, kw, ci, co = k.shape
    z = jnp.zeros((kh, 4, ci, 2 * co), k.dtype)
    z = z.at[:, 0:3, :, :co].set(k)     # q=0: kw = dw+1 in {0,1,2}
    z = z.at[:, 1:4, :, co:].set(k)     # q=1: kw = dw+2 in {1,2,3}
    return z


def _poly_kernel_3x3(k):
    """[3,3,ci,co] SAME/stride-1 kernel -> [3,3,2ci,2co] poly->poly kernel.

    Output phase q at block j reads input w = 2j+q+dw; in poly coordinates
    that is (block j+db, phase p) with (db,p) = divmod(q+dw, 2). Half the
    (W-tap, phase) entries are structurally zero — 2x the MACs of the
    original conv, at dense-lane MXU rates."""
    kh, kw, ci, co = k.shape
    z = jnp.zeros((kh, 3, 2 * ci, 2 * co), k.dtype)
    # q=0: dw=-1 -> (db=-1,p=1); dw=0 -> (0,0); dw=1 -> (0,1)
    z = z.at[:, 0, ci:, :co].set(k[:, 0])
    z = z.at[:, 1, :ci, :co].set(k[:, 1])
    z = z.at[:, 1, ci:, :co].set(k[:, 2])
    # q=1: dw=-1 -> (0,0); dw=0 -> (0,1); dw=1 -> (+1,0)
    z = z.at[:, 1, :ci, co:].set(k[:, 0])
    z = z.at[:, 1, ci:, co:].set(k[:, 1])
    z = z.at[:, 2, :ci, co:].set(k[:, 2])
    return z


def _max_pool_2x2_poly(xp, c):
    """2x2/stride-2 max pool of the poly form: H via even/odd row slices, W
    via the two phase channel-halves. Returns the plain [B, H/2, W/2, c].

    The optimization barrier forces the pooled tensor to materialize: without
    it XLA producer-fuses the whole max chain into the next stage's 3x3 conv,
    re-evaluating it once per window tap (profiled: 9x re-read of the 2x-size
    pre-pool tensor, 3.5 ms vs ~0.9 for the materialized form)."""
    a = jnp.maximum(xp[:, 0::2], xp[:, 1::2])
    return jax.lax.optimization_barrier(jnp.maximum(a[..., :c], a[..., c:]))


def _normalize_activation_grouped(x, groups, eps=1e-10, out_dtype=jnp.float32):
    """Unit-normalize each contiguous channel GROUP per pixel — the poly-form
    equivalent of `_normalize_activation` (each phase's 64 channels are one
    original pixel). The group sums ride the MXU via a [C,C] 0/1 block-matrix
    product that broadcasts them straight back to full channel width: every
    elementwise op stays on dense 128-lane tensors. (Per-half slice reduces
    were measured 2x slower — each half runs lane-masked at ~310 GB/s.)
    Precision.HIGH keeps f32-grade products for the fp32 statistics at half
    the cost of HIGHEST."""
    return _normalize_core_grouped(x, int(groups), float(eps),
                                   jnp.dtype(out_dtype))


def _group_mat(c, groups):
    gs = c // groups
    return jnp.kron(jnp.eye(groups, dtype=jnp.float32),
                    jnp.ones((gs, gs), jnp.float32))


def _grouped_ss(x, groups):
    xf = x.astype(jnp.float32)
    return jnp.einsum("...c,cd->...d", xf * xf,
                      _group_mat(x.shape[-1], groups),
                      precision=jax.lax.Precision.HIGH)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _normalize_core_grouped(x, groups, eps, out_dtype):
    inv = 1.0 / (jnp.sqrt(_grouped_ss(x, groups)) + eps)
    return (x * inv.astype(x.dtype)).astype(out_dtype)


def _normalize_core_grouped_fwd(x, groups, eps, out_dtype):
    # residual is x alone: the backward recomputes the (MXU-cheap) group
    # sums instead of storing full-width fp32 rt/inv tensors
    return _normalize_core_grouped(x, groups, eps, out_dtype), (x,)


def _normalize_core_grouped_bwd(groups, eps, out_dtype, res, ct):
    (x,) = res
    rt = jnp.sqrt(_grouped_ss(x, groups))
    inv = 1.0 / (rt + eps)
    ctc = ct.astype(x.dtype)
    t = jnp.einsum("...c,cd->...d",
                   ctc.astype(jnp.float32) * x.astype(jnp.float32),
                   _group_mat(x.shape[-1], groups),
                   precision=jax.lax.Precision.HIGH)
    scale = t * inv * inv / jnp.maximum(rt, 1e-20)
    dx = ctc * inv.astype(x.dtype) - x * scale.astype(x.dtype)
    return (dx,)


_normalize_core_grouped.defvjp(_normalize_core_grouped_fwd,
                               _normalize_core_grouped_bwd)


class _ConvParams(nn.Module):
    """Declares `kernel`/`bias` with nn.Conv's exact param paths and inits,
    for paths that consume the kernel in a rearranged form (poly stage 1).
    Checkpoint/param structure is identical to the nn.Conv it replaces."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


def lpips_poly_default(dtype, width, net_type="vgg") -> bool:
    """Resolve the stage-1 polyphase toggle (env VQVAE_TPU_LPIPS_POLY=1).

    Default OFF: despite per-op wins (the poly convs run at 188 vs 34-75
    TFLOP/s), the variant measured ~3 ms/iter SLOWER end-to-end than the
    canonical path on v5e — the transform's boundary costs (layout copies,
    the MXU group-norm, pool materialization) eat the lane-density win; see
    PERFORMANCE.md "rejected". Kept as a parity-tested escape hatch for
    hardware where the balance differs."""
    del dtype
    if net_type != "vgg" or width % 2:
        return False
    return os.environ.get("VQVAE_TPU_LPIPS_POLY", "0") == "1"


class VGG16Features(nn.Module):
    """torchvision VGG16 `.features` up to relu5_3, returning the 5 LPIPS taps.

    When the stage-1 polyphase path is active (see `lpips_poly_default`), the
    FIRST tap is returned in W-polyphase form [B, H, W/2, 128] (phase-major
    channel halves); `LPIPS.__call__` consumes it with a duplicated lin head.
    All other taps and all parameters are unchanged in either mode.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        taps = []
        idx = 0
        x = x.astype(self.dtype)
        poly = lpips_poly_default(self.dtype, x.shape[2])
        if poly:
            # stage 1 in W-polyphase form: dense 128-lane tensors instead of
            # half-padded C=64 (exact; see the block comment above
            # _poly_kernel_stem)
            k0, b0 = _ConvParams(64, 3, name="conv0")()
            k1, b1 = _ConvParams(64, 64, name="conv1")()
            bias_poly = jnp.concatenate([b0, b0]).astype(self.dtype)
            x = jax.lax.conv_general_dilated(
                x, _poly_kernel_stem(k0).astype(self.dtype),
                window_strides=(1, 2), padding=((1, 1), (1, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = nn.relu(x + bias_poly)
            x = jax.lax.conv_general_dilated(
                x, _poly_kernel_3x3(k1).astype(self.dtype),
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = nn.relu(x + jnp.concatenate([b1, b1]).astype(self.dtype))
            taps.append(_normalize_activation_grouped(x, 2,
                                                      out_dtype=self.dtype))
            x = _max_pool_2x2_poly(x, 64)
            idx = 2
            cfg = cfg[1:]
        for stage, (ch, n_convs) in enumerate(cfg):
            for _ in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            taps.append(_normalize_activation(x, out_dtype=self.dtype))
            if stage < len(cfg) - 1:
                x = _max_pool_2x2(x)
        return taps


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet `.features`, returning the 5 LPIPS taps."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        x = x.astype(self.dtype)
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=2, dtype=self.dtype,
                    name="conv0")(x)
        x = nn.relu(x)
        taps.append(_normalize_activation(x, out_dtype=self.dtype))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=2, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        taps.append(_normalize_activation(x, out_dtype=self.dtype))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        taps.append(_normalize_activation(x, out_dtype=self.dtype))
        x = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv3")(x)
        x = nn.relu(x)
        taps.append(_normalize_activation(x, out_dtype=self.dtype))
        x = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv4")(x)
        x = nn.relu(x)
        taps.append(_normalize_activation(x, out_dtype=self.dtype))
        return taps


class Fire(nn.Module):
    """SqueezeNet Fire module: squeeze 1x1 -> expand {1x1, 3x3} concat."""

    squeeze: int
    expand: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), name="expand1x1")(x))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3), padding=1, name="expand3x3")(x))
        return jnp.concatenate([e1, e3], axis=-1)


def _max_pool_ceil(x, window=3, stride=2):
    """torchvision squeezenet1_1 pools use ceil_mode=True."""
    h, w = x.shape[1], x.shape[2]
    pad_h = max(0, (-(h - window) % stride))
    pad_w = max(0, (-(w - window) % stride))
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=[(0, pad_h), (0, pad_w)])


class SqueezeNetFeatures(nn.Module):
    """torchvision squeezenet1_1 `.features`, returning the 7 LPIPS taps
    (reference networks.py:67-74: layers [2,5,8,10,11,12,13])."""

    @nn.compact
    def __call__(self, x):
        taps = []
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), padding=0,
                            name="conv0")(x))
        taps.append(_normalize_activation(x))                     # layer 2
        x = _max_pool_ceil(x)
        x = Fire(16, 64, name="fire1")(x)
        x = Fire(16, 64, name="fire2")(x)
        taps.append(_normalize_activation(x))                     # layer 5
        x = _max_pool_ceil(x)
        x = Fire(32, 128, name="fire3")(x)
        x = Fire(32, 128, name="fire4")(x)
        taps.append(_normalize_activation(x))                     # layer 8
        x = _max_pool_ceil(x)
        x = Fire(48, 192, name="fire5")(x)
        taps.append(_normalize_activation(x))                     # layer 10
        x = Fire(48, 192, name="fire6")(x)
        taps.append(_normalize_activation(x))                     # layer 11
        x = Fire(64, 256, name="fire7")(x)
        taps.append(_normalize_activation(x))                     # layer 12
        x = Fire(64, 256, name="fire8")(x)
        taps.append(_normalize_activation(x))                     # layer 13
        return taps


class LPIPS(nn.Module):
    """LPIPS(x, y) for NHWC images in (-1, 1) (reference modules/lpips.py:8-38).

    ``dtype`` sets the backbone conv compute dtype (bf16 for training-loss
    use, mirroring the reference's AMP 16-mixed LPIPS; fp32 default for
    eval-grade numbers). Normalization statistics and the final distance
    accumulation are always fp32; the normalized taps themselves are stored
    in ``dtype`` (they are the largest saved-for-backward tensors).
    """

    net_type: str = "vgg"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, reduce: bool = True):
        if self.net_type == "vgg":
            net = VGG16Features(dtype=self.dtype, name="net")
            channels = VGG16_CHANNELS
        elif self.net_type == "alex":
            net = AlexNetFeatures(dtype=self.dtype, name="net")
            channels = ALEX_CHANNELS
        elif self.net_type == "squeeze":
            net = SqueezeNetFeatures(name="net")
            channels = SQUEEZE_CHANNELS
        else:
            raise NotImplementedError(
                f"LPIPS net_type {self.net_type!r} not supported "
                "(vgg | alex | squeeze)")

        def z_score(im):
            return (im.astype(jnp.float32) - _SHIFT) / _SCALE

        feat_x = net(z_score(x))
        feat_y = net(z_score(y))

        total = 0.0
        tapvjp = lpips_tapvjp_default()
        for i, (fx, fy, ch) in enumerate(zip(feat_x, feat_y, channels)):
            lin = self.param(f"lin{i}", nn.initializers.ones, (ch, 1), jnp.float32)
            lin_eff = lin
            count_fix = 1.0
            if fx.shape[-1] == 2 * ch:
                # W-polyphase tap (stage 1, see VGG16Features): each spatial
                # position holds TWO pixels' channel groups — duplicate the
                # lin head and halve the spatial mean
                lin_eff = jnp.concatenate([lin, lin], axis=0)
                count_fix = 0.5
            if tapvjp:
                # diff-residual VJP (see lpips_tapvjp_default)
                total = total + count_fix * _tap_score(fx, fy, lin_eff)
                continue
            diff = (fx - fy) ** 2
            weighted = jnp.einsum("bhwc,co->bhwo", diff,
                                  lin_eff.astype(diff.dtype),
                                  preferred_element_type=jnp.float32)
            total = total + count_fix * jnp.mean(weighted, axis=(1, 2, 3))
        # reduce=False -> per-sample distances (B,), used by the masked eval
        # step to exclude zero-padded rows from partial final batches
        return jnp.mean(total) if reduce else total


# ---------------------------------------------------------------------------
# Fused training-path LPIPS (VGG): ONE concatenated backbone pass + manual
# recon-half backward
# ---------------------------------------------------------------------------

_VGG_CFG = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


def _conv3x3(h, kernel, bias, dtype):
    out = jax.lax.conv_general_dilated(
        h.astype(dtype), kernel.astype(dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias.astype(dtype)


def _conv3x3_input_grad(ct, kernel, dtype):
    """d conv3x3(SAME, stride 1) / d input: SAME conv with the kernel rotated
    180 degrees and I/O swapped (the exact transpose XLA's AD emits)."""
    k = jnp.flip(kernel, (0, 1)).swapaxes(2, 3)
    return jax.lax.conv_general_dilated(
        ct.astype(dtype), k.astype(dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _max_pool_2x2_bwd(a, ct):
    """VJP of _max_pool_2x2 at pre-pool activations ``a``: cotangent split
    equally among tied window maxima (JAX reduce-max convention)."""
    b, h, w, c = a.shape
    aw = a.reshape(b, h // 2, 2, w // 2, 2, c)
    m = jnp.max(aw, axis=(2, 4), keepdims=True)
    mask = (aw == m).astype(ct.dtype)
    ties = jnp.sum(mask, axis=(2, 4), keepdims=True)
    d = mask / ties * ct[:, :, None, :, None, :]
    return d.reshape(b, h, w, c)


def make_fused_lpips_vgg(params, dtype=jnp.bfloat16):
    """Training-path LPIPS(vgg): ``lpips(x, y) -> (B,) per-sample distance``
    over ONE concatenated (x ‖ y) backbone pass, with a hand-written VJP that
    backpropagates through the y (reconstruction) half only.

    Rationale (PERFORMANCE.md / VERDICT r1): the module path runs the VGG16
    features twice per step (images, recons — reference lpips.py:33 does the
    same); batch-concatenation halves the per-op count in the lane-starved
    C=64 stage-1. A naive ``net(concat(x, y))`` under autodiff would DOUBLE
    the backward cost (B=2N input-grad chain against a half-zero cotangent),
    so the backward is manual: frozen params mean input-grads only, computed
    on the y half alone — identical FLOPs to the module path's backward.

    Same math as ``LPIPS.__call__`` (parity-tested): z-score, taps after each
    stage's last relu, fp32-stat channel normalization, squared diff through
    the 1x1 lin heads, spatial mean, sum over layers. Params are captured as
    constants (they live in no optimizer).
    """
    net = params["net"]
    lins = [jnp.asarray(params[f"lin{i}"]) for i in range(len(_VGG_CFG))]
    kernels, biases = [], []
    idx = 0
    for ch, n_convs in _VGG_CFG:
        for _ in range(n_convs):
            kernels.append(jnp.asarray(net[f"conv{idx}"]["kernel"]))
            biases.append(jnp.asarray(net[f"conv{idx}"]["bias"]))
            idx += 1

    @jax.custom_vjp
    def pair_dist(x, y):
        return _fwd(x, y)[0]

    def _fwd(x, y):
        b = x.shape[0]
        h = jnp.concatenate([x, y], axis=0)
        h = ((h.astype(jnp.float32) - _SHIFT) / _SCALE).astype(dtype)

        acts = []          # post-relu conv outputs, y half only (residuals:
                           # saving the full 2B tensors kept the x half alive
                           # through the whole backward and measurably HURT —
                           # 83.9 vs 87.3 img/s from the extra HBM liveness)
        norm_res = []      # (rt, inv) of the y half per tap
        diffs = []         # normalized-tap diffs (B,...) per stage
        # cotangents must match the primal dtypes; carried as 0-size arrays
        # (custom_vjp residuals must be jax types)
        in_dtypes = (jnp.zeros((0,), x.dtype), jnp.zeros((0,), y.dtype))
        total = jnp.zeros((b,), jnp.float32)
        idx = 0
        for stage, (ch, n_convs) in enumerate(_VGG_CFG):
            for _ in range(n_convs):
                h = jax.nn.relu(_conv3x3(h, kernels[idx], biases[idx], dtype))
                acts.append(h[b:])
                idx += 1
            # channel unit-normalization, fp32 stats (utils.py:6-8)
            ss = jnp.sum(jnp.square(h.astype(jnp.float32)), axis=-1,
                         keepdims=True)
            rt = jnp.sqrt(ss)
            inv = 1.0 / (rt + 1e-10)
            normed = (h * inv.astype(h.dtype)).astype(dtype)
            fx, fy = normed[:b], normed[b:]
            diff = fy - fx
            diffs.append(diff)
            norm_res.append((rt[b:], inv[b:]))
            weighted = jnp.einsum("bhwc,co->bhwo", diff * diff,
                                  lins[stage].astype(diff.dtype),
                                  preferred_element_type=jnp.float32)
            total = total + jnp.mean(weighted, axis=(1, 2, 3))
            if stage < len(_VGG_CFG) - 1:
                h = _max_pool_2x2(h)
        return total, (acts, norm_res, diffs, b, in_dtypes)

    def _bwd(res, g):
        acts, norm_res, diffs, b, in_dtypes = res
        g = g.astype(jnp.float32)  # (B,)

        ct_next = None  # cotangent on the next stage's (post-pool) input
        idx = len(kernels)
        for stage in reversed(range(len(_VGG_CFG))):
            ch, n_convs = _VGG_CFG[stage]
            diff = diffs[stage]
            _, hh, ww, _ = diff.shape
            # d total/d fy = 2*diff*(lin weights) * g / (H*W); the einsum's
            # lin head has out-dim 1 so the pullback is a broadcast multiply
            scale = (g / (hh * ww))[:, None, None, None]
            lin_vec = lins[stage][:, 0].astype(jnp.float32)
            ct_fy = (2.0 * diff.astype(jnp.float32) * lin_vec
                     * scale).astype(diff.dtype)
            # through the normalization (same formula as _normalize_core_bwd)
            a_y = acts[idx - 1]
            rt, inv = norm_res[stage]
            t = jnp.sum(ct_fy.astype(jnp.float32) * a_y.astype(jnp.float32),
                        axis=-1, keepdims=True)
            nscale = t * inv * inv / jnp.maximum(rt, 1e-20)
            ct = (ct_fy * inv.astype(a_y.dtype)
                  - a_y * nscale.astype(a_y.dtype))
            if ct_next is not None:
                ct = ct + _max_pool_2x2_bwd(a_y, ct_next)
            # conv chain of this stage, reverse order (relu mask from the
            # post-relu act: post > 0 <=> pre > 0, and relu'(0) = 0)
            for k in reversed(range(n_convs)):
                idx -= 1
                ct = ct * (acts[idx] > 0).astype(ct.dtype)
                ct = _conv3x3_input_grad(ct, kernels[idx], dtype)
            ct_next = ct

        # ct_next is now d/d z-scored y; undo the z-score scaling. Cotangent
        # dtypes must equal the primal dtypes (fp32 images/recons under the
        # bf16 compute policy).
        dy = (ct_next.astype(jnp.float32) / _SCALE).astype(in_dtypes[1].dtype)
        dx = jnp.zeros(dy.shape, in_dtypes[0].dtype)
        return dx, dy

    pair_dist.defvjp(lambda x, y: _fwd(x, y), _bwd)
    return pair_dist


def lpips_weights_path(net_type: str) -> Path:
    env = os.environ.get("VQVAE_TPU_LPIPS_WEIGHTS_DIR")
    base = Path(env) if env else Path.home() / ".cache" / "vqvae_tpu"
    return base / f"lpips_{net_type}.npz"


def init_lpips(net_type: str, image_size: int, seed: int = 0,
               dtype=jnp.float32):
    """(module, params) — converted pretrained weights if available, else
    architecture-correct random init (with a warning)."""
    module = LPIPS(net_type=net_type, dtype=dtype)
    path = lpips_weights_path(net_type)
    if path.exists():
        flat = dict(np.load(path))
        params = _unflatten(flat)
        return module, jax.tree.map(jnp.asarray, params)
    warnings.warn(
        f"LPIPS pretrained weights not found at {path}; using random init. "
        "Run tools/convert_lpips_weights.py for quality-parity training.")
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    params = module.init(jax.random.PRNGKey(seed), dummy, dummy)["params"]
    return module, params


def _unflatten(flat: dict) -> dict:
    params = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return params


def flatten_params(params, prefix=""):
    out = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out
