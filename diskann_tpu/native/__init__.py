"""Native C++ host runtime: mmap IO, batched row gather, LRU row cache.

The compute path of this framework is JAX/XLA/Pallas on the TPU; the host
runtime around it (dataset IO, staging gathers for the tiered store, the hot
row cache) is native C++ exposed over a C ABI via ctypes — the structural
counterpart of the reference's Rust IO stack (`diskann-disk` readers,
`diskann-utils/src/io.rs`).  The library is compiled on first use with the
system toolchain and cached next to the sources; every entry point has a
pure-numpy fallback so the framework degrades gracefully without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhostio.so")
_SRC = os.path.join(_DIR, "hostio.cpp")

_lib = None
_tried = False


def _compile() -> bool:
    # Build to a temp path and rename: g++ -o truncates the target in
    # place (same inode), which segfaults any LIVE process that has the
    # old .so mmap'd.  rename() swaps the directory entry atomically and
    # old mappings keep their (now-anonymous) inode.
    tmp = f"{_SO}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-o", tmp, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _SO)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib():
    """Load (compiling if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _compile():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.hio_open.restype = ctypes.c_void_p
    lib.hio_open.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.hio_rows.restype = ctypes.c_int64
    lib.hio_rows.argtypes = [ctypes.c_void_p]
    lib.hio_dim.restype = ctypes.c_int64
    lib.hio_dim.argtypes = [ctypes.c_void_p]
    lib.hio_gather.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int64,
    ]
    lib.hio_close.argtypes = [ctypes.c_void_p]
    lib.hio_cache_create.restype = ctypes.c_void_p
    lib.hio_cache_create.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.hio_gather_cached.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.hio_cache_hits.restype = ctypes.c_int64
    lib.hio_cache_hits.argtypes = [ctypes.c_void_p]
    lib.hio_cache_misses.restype = ctypes.c_int64
    lib.hio_cache_misses.argtypes = [ctypes.c_void_p]
    lib.hio_cache_destroy.argtypes = [ctypes.c_void_p]
    lib.hio_pipe_create.restype = ctypes.c_void_p
    lib.hio_pipe_create.argtypes = [ctypes.c_int64]
    lib.hio_pipe_submit.restype = ctypes.c_int64
    lib.hio_pipe_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.hio_pipe_wait.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.hio_pipe_destroy.argtypes = [ctypes.c_void_p]
    lib.hio_uring_create.restype = ctypes.c_void_p
    lib.hio_uring_create.argtypes = [ctypes.c_int64]
    lib.hio_uring_gather.restype = ctypes.c_int64
    lib.hio_uring_gather.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.hio_uring_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


class NativeVectorFile:
    """mmap'd [n][dim] binary file with native batched row gather + LRU cache."""

    def __init__(self, path: str, elem_size: int = 4, *, cache_rows: int = 0,
                 threads: int | None = None, uring: bool = False,
                 uring_depth: int = 256):
        import numpy as np

        lib = get_lib()
        if lib is None:
            raise RuntimeError("native hostio unavailable")
        self._lib = lib
        self.path = path
        self._h = lib.hio_open(path.encode(), elem_size)
        if not self._h:
            raise OSError(f"hio_open failed for {path}")
        self.n = lib.hio_rows(self._h)
        self.dim = lib.hio_dim(self._h)
        self.elem_size = elem_size
        self.threads = threads or min(8, os.cpu_count() or 1)
        self._cache = (
            lib.hio_cache_create(self._h, cache_rows) if cache_rows else None
        )
        # io_uring batched reads (reference `platform/linux.rs` analogue):
        # wins on SSD cold reads; mmap+memcpy wins when page-cache-resident.
        # Creation probes the kernel — containers commonly disable the
        # syscalls, in which case gathers silently use the mmap path.
        self._uring = (
            lib.hio_uring_create(uring_depth) if uring else None
        ) or None
        self._np = np

    @property
    def uring_active(self) -> bool:
        return self._uring is not None

    def gather(self, ids) -> "np.ndarray":
        np = self._np
        ids = np.ascontiguousarray(ids, np.int64)
        out = np.empty((ids.size, self.dim), np.float32 if self.elem_size == 4
                       else np.uint8)
        if self._cache:
            self._lib.hio_gather_cached(
                self._h, self._cache,
                ids.ctypes.data_as(ctypes.c_void_p), ids.size,
                out.ctypes.data_as(ctypes.c_void_p),
            )
        elif self._uring is not None:
            rc = self._lib.hio_uring_gather(
                self._uring, self._h, ids.ctypes.data_as(ctypes.c_void_p),
                ids.size, out.ctypes.data_as(ctypes.c_void_p),
            )
            if rc != 0:
                # ring failure mid-flight: the ring is poisoned (stale
                # completions) — drop it and use the mmap path from now on
                self._lib.hio_uring_destroy(self._uring)
                self._uring = None
                self._lib.hio_gather(
                    self._h, ids.ctypes.data_as(ctypes.c_void_p), ids.size,
                    out.ctypes.data_as(ctypes.c_void_p), self.threads,
                )
        else:
            self._lib.hio_gather(
                self._h, ids.ctypes.data_as(ctypes.c_void_p), ids.size,
                out.ctypes.data_as(ctypes.c_void_p), self.threads,
            )
        return out

    @property
    def cache_stats(self):
        if not self._cache:
            return None
        return {
            "hits": self._lib.hio_cache_hits(self._cache),
            "misses": self._lib.hio_cache_misses(self._cache),
        }

    def gather_async(self, ids):
        """Submit an async row gather; returns a handle for `wait()`.
        Overlap pattern (the io_uring submit/complete split): submit batch
        i+1's gather, compute on batch i, then wait."""
        np = self._np
        if self._pipe is None:
            self._pipe = self._lib.hio_pipe_create(self.threads)
        ids = np.ascontiguousarray(ids, np.int64)
        out = np.empty((ids.size, self.dim), np.float32 if self.elem_size == 4
                       else np.uint8)
        ticket = self._lib.hio_pipe_submit(
            self._pipe, self._h, ids.ctypes.data_as(ctypes.c_void_p),
            ids.size, out.ctypes.data_as(ctypes.c_void_p),
        )
        return (ticket, ids, out)   # keep ids/out alive until wait

    def wait(self, handle):
        ticket, _ids, out = handle
        self._lib.hio_pipe_wait(self._pipe, ticket)
        return out

    _pipe = None

    def close(self):
        if self._uring:
            self._lib.hio_uring_destroy(self._uring)
            self._uring = None
        if self._pipe:
            self._lib.hio_pipe_destroy(self._pipe)
            self._pipe = None
        if self._cache:
            self._lib.hio_cache_destroy(self._cache)
            self._cache = None
        if self._h:
            self._lib.hio_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
