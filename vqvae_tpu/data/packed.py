"""Packed-record dataset: the FFCV `.beton` equivalent.

Writer (Python) + reader (C++ mmap via ctypes, pure-Python mmap fallback).
Format documented in csrc/packio.cpp. The write CLI is
``create_packed_dataset.py`` at the repo root, mirroring the reference's
``data/create_beton_file.py`` CLI.

Records are fixed-size HWC uint8 images (optionally zlib-compressed), already
resized to the training resolution — decode cost at train time is a memcpy
(raw) or inflate (zlib), with no JPEG/PIL work on the hot path.
"""

from __future__ import annotations

import ctypes
import mmap
import struct
import subprocess
import zlib
from pathlib import Path
from typing import Iterable, Optional

import numpy as np

MAGIC = 0x4B505156  # 'VQPK'
HEADER_FMT = "<IIQIIII32x"
HEADER_SIZE = 64
INDEX_FMT = "<QQ"

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "_native"
_LIB_PATH = _NATIVE_DIR / "libvqvae_packio.so"
_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc" / "packio.cpp"

_lib = None
_lib_failed = False


def _load_library():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not _LIB_PATH.exists():
        try:
            _NATIVE_DIR.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-std=c++17", "-shared", "-pthread",
                 "-o", str(_LIB_PATH), str(_CSRC), "-lz"],
                check=True, capture_output=True, timeout=180)
        except (OSError, subprocess.SubprocessError):
            _lib_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _lib_failed = True
        return None
    lib.packio_open.restype = ctypes.c_void_p
    lib.packio_open.argtypes = [ctypes.c_char_p]
    lib.packio_info.restype = None
    lib.packio_info.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(t) for t in (
        ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32)]
    lib.packio_read_batch.restype = ctypes.c_int
    lib.packio_read_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.packio_close.restype = None
    lib.packio_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def write_packed(path: str, images: Iterable[np.ndarray],
                 image_size: int, channels: int = 3,
                 compress: bool = False) -> int:
    """Write HWC uint8 images (already resized) into a .pack file.

    Streams: record payloads go to a temp sidecar file as they arrive and
    only the 16-byte index entries are held in memory, so packing
    production-scale datasets (ImageNet at 256^2 is ~250 GB raw) never
    materializes the data in RAM. The final file is header + index + data
    (the layout csrc/packio.cpp mmaps)."""
    import shutil
    import tempfile

    lengths = []
    tmp = tempfile.NamedTemporaryFile(
        dir=str(Path(path).parent), prefix=Path(path).name + ".",
        suffix=".tmp", delete=False)
    try:
        with tmp:
            for img in images:
                img = np.ascontiguousarray(img, np.uint8)
                assert img.shape == (image_size, image_size, channels), img.shape
                raw = img.tobytes()
                rec = zlib.compress(raw, 6) if compress else raw
                tmp.write(rec)
                lengths.append(len(rec))

        count = len(lengths)
        header = struct.pack(HEADER_FMT, MAGIC, 1, count, image_size,
                             image_size, channels, 1 if compress else 0)
        offset = HEADER_SIZE + count * struct.calcsize(INDEX_FMT)
        with open(path, "wb") as f:
            f.write(header)
            for length in lengths:
                f.write(struct.pack(INDEX_FMT, offset, length))
                offset += length
            with open(tmp.name, "rb") as data:
                shutil.copyfileobj(data, f, length=16 * 1024 * 1024)
    finally:
        Path(tmp.name).unlink(missing_ok=True)
    return count


class PackedDataset:
    """Random-access packed dataset; indexable like ImageFolderDataset.

    Uses the native mmap reader when the toolchain can build it; otherwise a
    pure-Python mmap fallback with identical semantics.
    """

    def __init__(self, path: str, image_size: Optional[int] = None,
                 num_threads: int = 4):
        self.path = str(path)
        if not Path(self.path).exists():
            raise FileNotFoundError(f"dataset path not found: {path}")
        self.num_threads = num_threads
        self._handle = None
        self._mm = None

        lib = _load_library()
        if lib is not None:
            self._handle = lib.packio_open(self.path.encode())
        if self._handle:
            count = ctypes.c_uint64()
            h = ctypes.c_uint32()
            w = ctypes.c_uint32()
            c = ctypes.c_uint32()
            mode = ctypes.c_uint32()
            lib.packio_info(self._handle, count, h, w, c, mode)
            self.count, self.h, self.w, self.c, self.mode = (
                count.value, h.value, w.value, c.value, mode.value)
        else:
            self._open_python()

        if image_size is not None and image_size != self.h:
            raise ValueError(
                f"packed file resolution {self.h} != requested {image_size}; "
                "re-pack with create_packed_dataset.py --max_resolution")

    def _open_python(self):
        f = open(self.path, "rb")
        self._mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        magic, version, count, h, w, c, mode = struct.unpack_from(
            HEADER_FMT, self._mm, 0)
        assert magic == MAGIC and version == 1, "bad packed file"
        self.count, self.h, self.w, self.c, self.mode = count, h, w, c, mode
        entry = struct.calcsize(INDEX_FMT)
        self._index = [struct.unpack_from(INDEX_FMT, self._mm,
                                          HEADER_SIZE + i * entry)
                       for i in range(count)]

    def __len__(self) -> int:
        return self.count

    def __getitem__(self, idx: int) -> np.ndarray:
        return self.read_batch(np.array([idx], np.int64))[0]

    def read_batch(self, indices: np.ndarray) -> np.ndarray:
        """Vectorized batch read: (n,) int64 -> (n, H, W, C) uint8."""
        indices = np.ascontiguousarray(indices, np.int64)
        n = len(indices)
        out = np.empty((n, self.h, self.w, self.c), np.uint8)
        if self._handle:
            lib = _load_library()
            err = lib.packio_read_batch(
                self._handle,
                indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self.num_threads)
            if err != 0:
                raise IOError(f"packio_read_batch failed: code {err}")
            return out
        rec = self.h * self.w * self.c
        for i, idx in enumerate(indices):
            off, length = self._index[int(idx)]
            buf = self._mm[off:off + length]
            if self.mode == 1:
                buf = zlib.decompress(buf)
            out[i] = np.frombuffer(buf, np.uint8).reshape(self.h, self.w, self.c)
        return out

    def close(self):
        if self._handle:
            _load_library().packio_close(self._handle)
            self._handle = None
        if self._mm is not None:
            self._mm.close()
            self._mm = None

    @property
    def is_native(self) -> bool:
        return self._handle is not None
