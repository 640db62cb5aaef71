"""Host-side input pipeline: image-folder dataset + prefetching batch loader.

Replaces the reference's torch DataLoader / Lightning DataModule stack
(data/datasets.py:8-28, data/datamodules.py:7-76) and the FFCV path
(common_utils.py:38-103) with a dependency-light pipeline feeding jitted TPU
steps:

- ``ImageFolderDataset``: rglob of png/jpg/bmp/JPEG (same extension set as
  reference datasets.py:12-13), PIL decode -> RGB -> bilinear-antialias resize
  to (image_size, image_size) -> uint8 HWC numpy. uint8 end-to-end on the
  host; the /255 normalization happens on-device (4x less host->device
  bandwidth than shipping float32).
- ``Loader``: deterministic per-epoch shuffling (seeded), multi-threaded
  decode + prefetch queue, drop_last for train (static batch shapes for XLA)
  and padded+masked final batch for eval.
- ``PackedDataset`` (vqvae_tpu/data/packed.py): the FFCV `.beton` equivalent —
  a packed binary record format with an mmap'd C++ reader.

The per-host sharding contract: each host loads ``global_batch /
num_hosts`` samples; per-device sub-sharding happens via the mesh.
"""

from __future__ import annotations

import pathlib
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np

EXTENSIONS = ("*.png", "*.jpg", "*.bmp", "*.JPEG")


def _load_pil(path: str, image_size: int) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB")
    if img.size != (image_size, image_size):
        img = img.resize((image_size, image_size), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


class ImageFolderDataset:
    """Recursive image-folder dataset (reference data/datasets.py:8-28)."""

    def __init__(self, folder: str, image_size: int):
        root = pathlib.Path(folder)
        if not root.is_dir():
            raise FileNotFoundError(f"dataset path not found: {folder}")
        samples = []
        for ext in EXTENSIONS:
            samples.extend(root.rglob(ext))
        self.samples = sorted(samples)
        if not self.samples:
            raise FileNotFoundError(f"no images found under {folder}")
        self.image_size = image_size

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> np.ndarray:
        return _load_pil(str(self.samples[idx]), self.image_size)


class Loader:
    """Threaded prefetching batch loader over an indexable dataset.

    Yields dicts {"image": (B,H,W,C) uint8, "mask": (B,) bool}. For
    ``drop_last=False`` the final short batch is zero-padded to the static
    batch size with mask=False rows (XLA needs static shapes; the reference
    relies on torch dynamic batching, datamodules.py:57-76).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0, num_workers: int = 4,
                 prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState((self.seed * 100003 + self.epoch) % (2 ** 31))
            return rng.permutation(n)
        return np.arange(n)

    def __iter__(self) -> Iterator[dict]:
        order = self._order()
        n = len(order)
        n_batches = len(self)
        bs = self.batch_size

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    idx = order[b * bs:(b + 1) * bs]
                    imgs = list(pool.map(self.dataset.__getitem__, idx))
                    mask = np.ones((bs,), bool)
                    if len(imgs) < bs:
                        pad = bs - len(imgs)
                        imgs.extend([np.zeros_like(imgs[0])] * pad)
                        mask[len(idx):] = False
                    q.put({"image": np.stack(imgs), "mask": mask})
            q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def get_loaders(loader_type: str, dirpath: str, image_size: int,
                batch_size: int, workers: int, seed: int,
                mode: str = "train"):
    """Loader factory mirroring reference get_datamodule
    (common_utils.py:38-103): 'standard' = image folders train/ validation/
    test/; 'packed' = packed record files train.pack / validation.pack /
    test.pack (the FFCV-beton equivalent).
    """
    import os
    if not os.path.isdir(dirpath):
        raise FileNotFoundError(f"dataset path not found: {dirpath}")
    dirpath = dirpath if dirpath.endswith("/") else dirpath + "/"

    def make_ds(subpath: str):
        if loader_type == "standard":
            return ImageFolderDataset(dirpath + subpath, image_size)
        elif loader_type in ("packed", "ffcv"):
            from vqvae_tpu.data.packed import PackedDataset
            return PackedDataset(dirpath + subpath.rstrip("/") + ".pack",
                                 image_size)
        raise ValueError(f"loader type not recognized: {loader_type}")

    if mode == "train":
        train = Loader(make_ds("train/"), batch_size, shuffle=True,
                       drop_last=True, seed=seed, num_workers=workers)
        val = Loader(make_ds("validation/"), batch_size, shuffle=False,
                     drop_last=False, seed=seed, num_workers=workers)
        return train, val
    test = Loader(make_ds("test/"), batch_size, shuffle=False,
                  drop_last=False, seed=seed, num_workers=workers)
    return test
