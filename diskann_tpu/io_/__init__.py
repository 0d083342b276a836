"""Dataset and index IO: fbin/fvecs readers, versioned save/load manifests."""

from diskann_tpu.io_.fbin import read_fbin, write_fbin, read_fvecs, read_ivecs

__all__ = ["read_fbin", "write_fbin", "read_fvecs", "read_ivecs"]
