"""Memory tiering: quantized codes in HBM, full vectors in host RAM.

Replaces `diskann-disk` (the SSD tier): the reference keeps PQ codes in RAM
for traversal and reads full-precision sectors from NVMe for rerank
(`disk_provider.rs:634-800`, io_uring at `platform/linux.rs`).  On TPU the
equivalent hierarchy is HBM <- host RAM: compact codes and the graph live in
HBM; full vectors stay in (optionally memory-mapped) host RAM and are
staged to the device per search batch for the rerank step — `device_put`
double-buffering standing in for io_uring batched reads."""

from diskann_tpu.tiered.index import TieredIndex, HostVectorStore
from diskann_tpu.tiered.stores import SqliteVectorStore
from diskann_tpu.tiered.merged_build import build_merged

__all__ = ["TieredIndex", "HostVectorStore", "SqliteVectorStore", "build_merged"]
