from vqvae_tpu.ops.vq import nearest_codes

__all__ = ["nearest_codes"]
