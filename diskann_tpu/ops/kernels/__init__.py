"""Pallas TPU kernels for the ops XLA schedules poorly.

The measured per-`while`-iteration scheduling floor (~0.5ms) and per-op
costs mean a beam-search hop built from ~10 XLA ops pays ~5-10ms of pure
overhead.  These kernels fuse a hop's list operations into one op."""

from diskann_tpu.ops.kernels.hop_update import hop_update, hop_update_ref

__all__ = ["hop_update", "hop_update_ref"]
