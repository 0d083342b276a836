"""Readers/writers for the standard ANN dataset binary formats.

- ``.fbin`` / ``.u8bin`` / ``.i8bin``: ``[npts:i32][dim:i32]`` header followed
  by row-major data (the BigANN / DiskANN dataset format; the reference reads
  these via `diskann-utils/src/io.rs`).
- ``.fvecs`` / ``.ivecs``: per-row ``[dim:i32][row data]`` (TexMex SIFT format).

All readers return numpy arrays (host side); moving to device is the caller's
choice so large datasets can stay in host RAM for the tiered store.
"""

from __future__ import annotations

import os

import numpy as np

_BIN_DTYPES = {
    ".fbin": np.float32,
    ".u8bin": np.uint8,
    ".i8bin": np.int8,
    ".ibin": np.int32,
}


def read_fbin(path: str, dtype=None, *, mmap: bool = False) -> np.ndarray:
    """Read a [npts][dim] header binary file. dtype inferred from extension
    unless given explicitly."""
    if dtype is None:
        ext = os.path.splitext(path)[1]
        dtype = _BIN_DTYPES.get(ext, np.float32)
    with open(path, "rb") as f:
        header = np.fromfile(f, dtype=np.int32, count=2)
        npts, dim = int(header[0]), int(header[1])
    itemsize = np.dtype(dtype).itemsize
    expected = 8 + npts * dim * itemsize
    actual = os.path.getsize(path)
    if actual < expected:
        raise ValueError(
            f"{path}: header says {npts}x{dim} ({expected} bytes) but file has {actual}"
        )
    if mmap:
        data = np.memmap(path, dtype=dtype, mode="r", offset=8, shape=(npts, dim))
    else:
        with open(path, "rb") as f:
            f.seek(8)
            data = np.fromfile(f, dtype=dtype, count=npts * dim).reshape(npts, dim)
    return data


def write_fbin(path: str, data: np.ndarray) -> None:
    data = np.ascontiguousarray(data)
    with open(path, "wb") as f:
        np.array([data.shape[0], data.shape[1]], dtype=np.int32).tofile(f)
        data.tofile(f)


def _read_vecs(path: str, dtype) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.int32)
    if raw.size == 0:
        return np.empty((0, 0), dtype=dtype)
    dim = int(raw[0])
    row_ints = dim * np.dtype(dtype).itemsize // 4 + 1
    if raw.size % row_ints != 0:
        raise ValueError(f"{path}: not a valid vecs file (dim={dim})")
    mat = raw.reshape(-1, row_ints)
    return mat[:, 1:].view(dtype)


def read_fvecs(path: str) -> np.ndarray:
    return _read_vecs(path, np.float32)


def read_ivecs(path: str) -> np.ndarray:
    return _read_vecs(path, np.int32)
