"""Graph index configuration.

Mirrors the reference's typed builder config (`diskann/src/graph/config/mod.rs:180`)
with the same validated defaults (`config/defaults.rs:14-41`):
alpha=1.2, slack factor=1.3, max occlusion=750, filter beta=0.5,
saturate_after_prune=False.  TPU-specific knobs (batch sizes, history capacity,
hop caps — needed because XLA requires static shapes) live here too.
"""

from __future__ import annotations

import dataclasses
import enum
import math

from diskann_tpu.ops.distance import Metric


class PruneKind(enum.Enum):
    """Occlusion rule — reference `diskann/src/graph/config/mod.rs:57-104`.

    ``TriangleInequality`` for L2/cosine metrics (occ factor = max ratio
    d(p,k)/d(j,k)); ``Occluding`` for inner product (hard knockout when
    d(j,k) < alpha * d(p,k)).
    """

    TriangleInequality = "triangle"
    Occluding = "occluding"

    @staticmethod
    def from_metric(metric: Metric) -> "PruneKind":
        if metric == Metric.InnerProduct:
            return PruneKind.Occluding
        return PruneKind.TriangleInequality


# Matches OCCLUDING_MASK, `config/mod.rs` (occluding rule adds this to alpha
# to knock a candidate out permanently for the current ladder rung).
OCCLUDING_MASK = 0.01


@dataclasses.dataclass(frozen=True)
class GraphConfig:
    """Build/search configuration for the Vamana graph.

    Defaults mirror `diskann/src/graph/config/defaults.rs:14-41` and the
    example configs in `diskann-benchmark/example/graph-index.json`.
    """

    # Target (pruned) degree R.
    max_degree: int = 32
    # Build-time search list size.
    l_build: int = 50
    # Occlusion factor alpha.
    alpha: float = 1.2
    # Degree slack: adjacency rows hold floor(R * slack) entries before a
    # backedge re-prune triggers (defaults.rs:27).
    graph_slack_factor: float = 1.3
    # Cap on prune pool size (defaults.rs:14).
    max_occlusion_size: int = 750
    # Saturate adjacency lists to exactly R after pruning (defaults.rs:23).
    saturate_after_prune: bool = False
    # Metric; also determines the prune rule.
    metric: Metric = Metric.L2
    # Number of backedges added per inserted node (reference takes
    # `new_neighbors.take(max_backedges)`, index.rs:324; default = all).
    max_backedges: int | None = None
    # Intra-batch candidate policy for multi_insert ('all' | 'none' | int).
    intra_batch_candidates: str | int = "all"

    # --- TPU-specific static-shape knobs ---
    # Beam width W for search (reference default 1, `index.rs:1946`).
    beam_width: int = 1
    # Hard cap on beam-search hops (safety bound for lax.while_loop; the loop
    # exits early on convergence like the reference's cursor check).
    max_hops: int = 512
    # Hop cap for the BUILD's candidate-generation search (phase 2 of
    # multi_insert).  The frontier-batched while_loop runs to the SLOWEST
    # query's convergence, so straggler queries make every batch pay
    # worst-case iterations; a cap trades a slightly shallower candidate
    # pool for bounded batch time (same lever as search-side max_hops —
    # io_limit early-termination analogue).  None = config.max_hops.
    build_max_hops: int | None = None
    # Capacity of the per-query "scored ids" dedup history.  The reference
    # uses a hash set (`scratch.visited`); we use a bounded buffer compared
    # with one broadcasted equality per hop.  0 = auto (4 * l * slack).
    visited_capacity: int = 0
    # Router start points: instead of one global medoid (the reference's
    # start-point strategies, `start_point.rs:19-41`), score each query
    # against `router_size` sampled live nodes with ONE MXU matmul and
    # start the walk from the `router_starts` nearest — cuts early hops
    # that every query would otherwise spend descending from the medoid.
    # 0 disables (falls back to medoid).
    #
    # Size the sample for CLUSTER COVERAGE, not just hop savings: on data
    # with many small well-separated clusters, greedy navigation cannot
    # tunnel into a cluster no start point lands near — an unsampled
    # cluster's points become misses at ANY search L.  Measured on
    # 250k/4096-cluster synthetic: router_size=8192 (Poisson ~2 samples
    # per cluster, 13.5% clusters unsampled) capped recall at 0.983
    # regardless of graph degree or L; the matmul is one MXU op, so a
    # 64k sample costs ~nothing and drops the unsampled share to e^-16.
    # (64k beat 32k by ~6-12% QPS at identical recall on the 1M bench —
    # better starts save a hop — /tmp/r2c_qps1.json.)
    router_size: int = 65536
    router_starts: int = 4

    def __post_init__(self):
        if self.max_degree <= 0:
            raise ValueError("max_degree must be positive")
        if self.l_build < self.max_degree:
            # Same validation stance as the reference builder: L >= R.
            object.__setattr__(self, "l_build", max(self.l_build, self.max_degree))
        if not (self.alpha >= 1.0):
            raise ValueError("alpha must be >= 1.0")
        if self.graph_slack_factor < 1.0:
            raise ValueError("graph_slack_factor must be >= 1.0")

    @property
    def max_degree_with_slack(self) -> int:
        return int(math.floor(self.max_degree * self.graph_slack_factor))

    @property
    def prune_kind(self) -> PruneKind:
        return PruneKind.from_metric(self.metric)

    def history_capacity(self, l_search: int) -> int:
        if self.visited_capacity > 0:
            return self.visited_capacity
        # Generous default: room for start points + every hop's expansions.
        return max(256, 4 * l_search + 2 * self.max_degree_with_slack)

    def alpha_ladder(self) -> tuple[float, ...]:
        """The alpha schedule of occlude_list (`index.rs:2599,2741`):
        starts at 1.0, multiplies by min(alpha, 1.2) until reaching alpha."""
        ladder = []
        cur = 1.0
        inc = min(self.alpha, 1.2)
        while cur < self.alpha:
            ladder.append(cur)
            if inc <= 1.0:
                break
            cur = min(cur * inc, self.alpha)
        ladder.append(self.alpha)
        # dedupe while preserving order (alpha == 1.0 gives a single rung)
        out: list[float] = []
        for a in ladder:
            if not out or out[-1] != a:
                out.append(a)
        return tuple(out)
