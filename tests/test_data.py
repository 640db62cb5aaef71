"""Packed dataset format: writer/reader round-trip, native C++ reader parity
with the pure-Python fallback, loader integration.
"""

import numpy as np
import pytest

from vqvae_tpu.data.packed import PackedDataset, write_packed, _load_library
from vqvae_tpu.data.dataset import Loader


@pytest.fixture(scope="module", params=[False, True],
                ids=["raw", "zlib"])
def pack_file(request, tmp_path_factory):
    compress = request.param
    path = tmp_path_factory.mktemp("pack") / "test.pack"
    rs = np.random.RandomState(0)
    imgs = [rs.randint(0, 255, (8, 8, 3), np.uint8) for _ in range(10)]
    n = write_packed(str(path), imgs, 8, compress=compress)
    assert n == 10
    return str(path), imgs


def test_roundtrip(pack_file):
    path, imgs = pack_file
    ds = PackedDataset(path)
    assert len(ds) == 10
    assert (ds.h, ds.w, ds.c) == (8, 8, 3)
    for i in [0, 3, 9]:
        np.testing.assert_array_equal(ds[i], imgs[i])
    batch = ds.read_batch(np.array([9, 0, 5], np.int64))
    np.testing.assert_array_equal(batch[0], imgs[9])
    np.testing.assert_array_equal(batch[1], imgs[0])
    ds.close()


def test_native_reader_builds_and_matches_python(pack_file):
    path, imgs = pack_file
    ds = PackedDataset(path)
    assert ds.is_native, "native packio library failed to build/load"
    native = ds.read_batch(np.arange(10, dtype=np.int64))
    ds.close()

    # force the python fallback
    ds_py = PackedDataset.__new__(PackedDataset)
    ds_py.path = path
    ds_py.num_threads = 1
    ds_py._handle = None
    ds_py._mm = None
    ds_py._open_python()
    py = ds_py.read_batch(np.arange(10, dtype=np.int64))
    ds_py.close()
    np.testing.assert_array_equal(native, py)


def test_loader_over_packed(pack_file):
    path, _ = pack_file
    ds = PackedDataset(path)
    loader = Loader(ds, batch_size=4, shuffle=True, drop_last=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 8, 8, 3)
    ds.close()


def test_resolution_mismatch_raises(pack_file):
    path, _ = pack_file
    with pytest.raises(ValueError):
        PackedDataset(path, image_size=16)
