"""Pallas TPU kernels for the ops XLA schedules poorly.

- `fatrow_expand`: the production beam-expansion kernel — pipelined fat-row
  DMAs + in-VMEM int8 scoring (see `graph/packed.py` for the layout).
- `block_patch`: aligned-block DMA patching of the packed word table
  (XLA's windowed scatter serializes per index).

A fused merge+frontier-select kernel (`hop_update`) lived here through
round 2; it never beat the 2-operand packed-key XLA merge sorts on the
headline bench and was removed (the dp=128 code path shrank the list
widths its fusion targeted).
"""

from diskann_tpu.ops.kernels.fatrow_expand import fatrow_expand, fatrow_expand_ref
from diskann_tpu.ops.kernels.block_patch import block_patch

__all__ = ["fatrow_expand", "fatrow_expand_ref", "block_patch"]
