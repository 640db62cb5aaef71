"""2D convolution fused with FIR up/downsampling.

TPU equivalent of the reference's ``conv2d_resample``
(…/stylegan2_discriminator/utils/ops/conv2d_resample.py:59-154): the same
padding arithmetic and operation ordering, expressed as XLA convolutions in
NHWC. The discriminator's hot path (down=2 with the [1,3,3,1] low-pass) is
two convs — a depthwise FIR (VPU) and a strided dense conv (MXU) — which XLA
pipelines without round-tripping to HBM between them.

Weights are HWIO. ``flip_weight=True`` = correlation (torch conv semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vqvae_tpu.ops.upfirdn2d import _get_filter_size, _parse_padding, upfirdn2d


def _conv2d(x, w, stride=1, padding=0, flip_weight=True):
    if not flip_weight:
        w = w[::-1, ::-1]
    if isinstance(padding, int):
        pad = ((padding, padding), (padding, padding))
    else:
        py, px = padding
        pad = ((py, py), (px, px))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv2d_resample(x: jnp.ndarray, w: jnp.ndarray, f=None, up: int = 1,
                    down: int = 1, padding: int = 0,
                    flip_weight: bool = True,
                    flip_filter: bool = False) -> jnp.ndarray:
    """Convolution with optional FIR resampling (reference
    conv2d_resample.py:59-154). Padding is applied once, up front.
    """
    assert up >= 1 and down >= 1
    kh, kw = w.shape[0], w.shape[1]
    fw, fh = _get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # 1x1 kernel + downsampling only: FIR+down fused, then pointwise conv
    if kw == 1 and kh == 1 and down > 1 and up == 1:
        x = upfirdn2d(x, f, down=down, padding=[px0, px1, py0, py1],
                      flip_filter=flip_filter)
        return _conv2d(x, w, flip_weight=flip_weight)

    # 1x1 kernel + upsampling only: pointwise conv, then FIR+up
    if kw == 1 and kh == 1 and up > 1 and down == 1:
        x = _conv2d(x, w, flip_weight=flip_weight)
        return upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1],
                         gain=up ** 2, flip_filter=flip_filter)

    # downsampling only: FIR pad+filter, then strided conv
    if down > 1 and up == 1:
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        return _conv2d(x, w, stride=down, flip_weight=flip_weight)

    # plain conv with symmetric non-negative padding
    if up == 1 and down == 1 and px0 == px1 and py0 == py1 and px0 >= 0 and py0 >= 0:
        return _conv2d(x, w, padding=(py0, px0), flip_weight=flip_weight)

    # generic fallback: upsample (with filter if up>1), conv, downsample
    x = upfirdn2d(x, (f if up > 1 else None), up=up,
                  padding=[px0, px1, py0, py1],
                  gain=up ** 2 if up > 1 else 1, flip_filter=flip_filter)
    x = _conv2d(x, w, flip_weight=flip_weight)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x
