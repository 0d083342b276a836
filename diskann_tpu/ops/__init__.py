"""L1 numerics: batched distance computation, top-k, and merge primitives.

Replaces the reference's `diskann-wide` (SIMD abstraction), `diskann-vector`
(distance kernels) and `diskann-linalg` crates.  On TPU there is no hand-rolled
SIMD: distances are dense matrix contractions on the MXU and top-k/merges are
XLA sorts, so the whole L1 surface is a handful of jit-friendly functions.
"""

from diskann_tpu.ops.distance import (
    Metric,
    pairwise_distance,
    distance_to_set,
    squared_norms,
    preprocess_for_metric,
)
from diskann_tpu.ops.topk import topk_smallest, merge_sorted

__all__ = [
    "Metric",
    "pairwise_distance",
    "distance_to_set",
    "squared_norms",
    "preprocess_for_metric",
    "topk_smallest",
    "merge_sorted",
]
