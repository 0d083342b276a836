"""L4 multi-chip scaling over `jax.sharding.Mesh`.

The reference is a single-node library; its only "scale-out" story is the
RAM-budget sharded build + merge (`diskann-disk/src/utils/partition.rs:23`,
`build/builder/core.rs:34-76`).  On TPU we promote that design to first-class
device parallelism:

- **Shard parallelism** (`sharded.py`): the database is partitioned across
  devices; each device owns an independent Vamana subgraph over its shard
  (build is conflict-free by construction), and search fans the query batch
  out to every shard, runs the frontier-batched beam search locally, and
  merges per-shard top-k lists with an `all_gather` + sorted merge over ICI.
- **Query data-parallelism**: a replicated index with the query batch sharded
  over devices — plain `NamedSharding` on the batch axis, no code changes.
"""

from diskann_tpu.parallel.sharded import ShardedGraphIndex, sharded_flat_search

__all__ = ["ShardedGraphIndex", "sharded_flat_search"]
