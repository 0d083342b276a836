"""Brute-force flat index (reference: `diskann/src/flat/mod.rs:6-30`)."""

from diskann_tpu.flat.index import FlatIndex

__all__ = ["FlatIndex"]
