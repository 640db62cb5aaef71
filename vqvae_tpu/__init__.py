"""tpu-vqgan: a TPU-native JAX framework for training VQ-VAE / VQGAN image tokenizers.

Re-designed from scratch for TPU (JAX / XLA / Pallas / shard_map) with the full
capability surface of SerezD/vqvae-vqgan-pytorch-lightning:

- conv ResNet encoder/decoder (NHWC, bf16 compute / fp32 params)
- four vector-quantization bottlenecks: standard argmin, EMA, Gumbel-softmax,
  MaskGIT entropy — with straight-through gradients and dead-code re-init
- VQGAN loss stack: LPIPS perceptual loss + StyleGAN2 discriminator with
  fused FIR-resample / bias-act ops (XLA + Pallas, no CUDA)
- data-parallel training over a `jax.sharding.Mesh` via shard_map (explicit
  psum for gradients, EMA codebook state, and metrics)
- host input pipeline (image-folder + packed-record format replacing FFCV)
- evaluation suite: L2 / PSNR / SSIM / rFID / perplexity / codebook usage
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level conveniences (keep `import vqvae_tpu` light)."""
    if name in ("VQVAE", "model_rngs"):
        from vqvae_tpu.models import vqvae
        return getattr(vqvae, name)
    if name in ("Config", "load_config", "parse_config"):
        from vqvae_tpu import config
        return getattr(config, name)
    if name == "Trainer":
        from vqvae_tpu.train.loop import Trainer
        return Trainer
    raise AttributeError(f"module 'vqvae_tpu' has no attribute {name!r}")
