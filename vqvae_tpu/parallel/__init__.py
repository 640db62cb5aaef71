from vqvae_tpu.parallel.mesh import create_mesh, local_batch_size, shard_batch

__all__ = ["create_mesh", "local_batch_size", "shard_batch"]
