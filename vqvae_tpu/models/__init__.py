from vqvae_tpu.models.autoencoder import (
    Decoder,
    Downsample,
    Encoder,
    GroupNorm,
    ResBlock,
    Upsample,
)
from vqvae_tpu.models.quantizers import (
    EMAVectorQuantizer,
    EntropyVectorQuantizer,
    GumbelVectorQuantizer,
    VectorQuantizer,
    get_codebook_usage,
    make_quantizer,
    reinit_unused_codes,
)
from vqvae_tpu.models.vqvae import VQVAE

__all__ = [
    "GroupNorm", "ResBlock", "Downsample", "Upsample", "Encoder", "Decoder",
    "VectorQuantizer", "EMAVectorQuantizer", "GumbelVectorQuantizer",
    "EntropyVectorQuantizer", "make_quantizer", "get_codebook_usage",
    "reinit_unused_codes", "VQVAE",
]
