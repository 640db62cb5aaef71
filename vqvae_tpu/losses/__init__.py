from vqvae_tpu.losses.losses import (
    discriminator_loss,
    generator_loss,
    l1_loss,
    l2_loss,
    r1_penalty,
)

__all__ = ["generator_loss", "discriminator_loss", "l1_loss", "l2_loss",
           "r1_penalty"]
