"""diskann_tpu — a TPU-native vector index & query engine (JAX/XLA/Pallas).

A from-scratch re-design of the capability set of microsoft/DiskANN (the Rust
"DiskANN3" workspace) for TPU hardware.  Instead of the reference's per-vector
SIMD loops, per-query scratch pools, tokio tasks and io_uring sector reads, every
hot path here is a *batched dense kernel*:

- Greedy beam search runs frontier-synchronous across a large query batch; each
  hop is a padded-adjacency gather followed by a (batch x candidates) . dim
  distance contraction on the MXU (see ``diskann_tpu.graph.search``).
- RobustPrune (alpha-occlusion, reference ``diskann/src/graph/index.rs:2565``)
  is a batched candidate x candidate distance matrix plus a masked sequential
  promotion scan (see ``diskann_tpu.graph.prune``).
- The graph is a fixed-degree padded ``int32 [N, R_slack]`` array driven by XLA
  gathers (reference bounds degree by R * GRAPH_SLACK_FACTOR already:
  ``diskann/src/graph/config/defaults.rs:27``).
- Quantizers (PQ / scalar / minmax / spherical / binary) train with jit'd
  k-means (matmul + argmin) and search with ADC lookup-table kernels
  (see ``diskann_tpu.quant``).
- Multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map`` collectives:
  database-sharded flat & graph search with top-k merge over ICI, and
  query-sharded (data-parallel) batch search (see ``diskann_tpu.parallel``).

Layer map (mirrors SURVEY.md section 1, re-architected):

    L5  bench/      JSON-driven benchmark registry, recall/QPS harness
    L4  parallel/   mesh sharding, collective top-k, sharded build
    L3  graph/      Vamana: search / insert / inplace-delete / prune
        flat/       brute-force index (also the groundtruth tool)
        tiered/     PQ-in-HBM + host-RAM full vectors (SSD-tier analogue)
    L2  quant/      kmeans, PQ, SQ, MinMax, spherical (RaBitQ), binary
        io_/        fbin/fvecs IO, versioned save/load manifests
    L1  ops/        distance matrices, top-k, sorted merges, Pallas kernels
"""

from diskann_tpu.ops.distance import Metric
from diskann_tpu.graph.config import GraphConfig
from diskann_tpu.graph.index import GraphIndex
from diskann_tpu.flat.index import FlatIndex

__version__ = "0.1.0"

__all__ = [
    "Metric",
    "GraphConfig",
    "GraphIndex",
    "FlatIndex",
    "__version__",
]
