from vqvae_tpu.data.dataset import ImageFolderDataset, Loader, get_loaders

__all__ = ["ImageFolderDataset", "Loader", "get_loaders"]
