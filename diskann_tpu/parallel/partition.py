"""Shard partitioning for distributed / memory-budgeted builds.

Reference: `diskann-disk/src/utils/partition.rs:23` (`partition_with_ram_budget`)
and `build/builder/core.rs:34-76`: k-means the dataset into shards, assign
every vector to its ``overlap`` closest shards (2 by default — the overlap is
what keeps cross-shard neighborhoods searchable after the merge), build each
shard independently, merge by id union.  Here the same scheme feeds
`ShardedGraphIndex`: each mesh device owns one (or more) shards."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from diskann_tpu.ops.distance import Metric, distance_to_set
from diskann_tpu.quant.kmeans import kmeans


def kmeans_partition(
    vectors,
    n_shards: int,
    *,
    overlap: int = 2,
    seed: int = 0,
    train_points: int = 1 << 16,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (centers [n_shards, d], assignments [N, overlap]) — each row's
    `overlap` nearest shard ids, closest first."""
    vectors = jnp.asarray(vectors, jnp.float32)
    centers, _ = kmeans(
        jax.random.key(seed), vectors, n_shards, max_train_points=train_points
    )
    d = distance_to_set(vectors, centers, Metric.L2)
    order = jnp.argsort(d, axis=1)[:, :overlap]
    return np.asarray(centers), np.asarray(order, np.int64)


def shard_lists(assignments: np.ndarray, n_shards: int) -> list[np.ndarray]:
    """Invert [N, overlap] assignments into per-shard row lists."""
    out = []
    for s in range(n_shards):
        rows = np.nonzero((assignments == s).any(axis=1))[0]
        out.append(rows)
    return out


def estimate_build_ram_bytes(n: int, dim: int, r_slack: int, dp: int = 32) -> int:
    """HBM estimate for one shard's build (the analogue of
    `estimate_build_index_ram_usage`, core.rs:41): vectors + adjacency +
    packed tables + working buffers."""
    vectors = n * dim * 4
    adjacency = n * r_slack * 4
    packed = n * r_slack * dp + n * r_slack * 4 + n * dp
    return int((vectors + adjacency + packed) * 1.4)  # +40% working set
