"""L3 core algorithm: Vamana graph search / insert / delete / prune.

Replaces the reference `diskann` crate (`DiskANNIndex`,
`diskann/src/graph/index.rs:58`).  Hot paths are batched device kernels;
the ``GraphIndex`` facade owns the host-side orchestration (capacity growth,
batching, start points, freelist) that the reference spreads across tokio
tasks and provider glue.
"""

from diskann_tpu.graph.config import GraphConfig, PruneKind
from diskann_tpu.graph.index import GraphIndex
from diskann_tpu.graph.search import beam_search, SearchResult
from diskann_tpu.graph.prune import robust_prune, PruneResult

__all__ = [
    "GraphConfig",
    "PruneKind",
    "GraphIndex",
    "beam_search",
    "SearchResult",
    "robust_prune",
    "PruneResult",
]
