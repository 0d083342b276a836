"""End-to-end Vamana build + search tests (recall-based integration tests,
mirroring the reference's grid cases and recall gates,
`diskann/src/graph/test/cases/*`, `diskann-benchmark-core/src/recall.rs`)."""

import numpy as np
import pytest

from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
from diskann_tpu.bench.recall import knn_recall


def check_graph_invariants(idx: GraphIndex):
    n = idx.n
    adj = np.asarray(idx.state.adjacency[:n])
    deg = np.asarray(idx.state.degrees[:n])
    r_slack = idx.config.max_degree_with_slack
    # degree bound
    assert (deg <= r_slack).all()
    # degree counts match row contents
    assert ((adj >= 0).sum(axis=1) == deg).all()
    for i in range(n):
        row = adj[i][adj[i] >= 0]
        # no self loops
        assert i not in row, i
        # in-range ids
        assert (row < n).all()
        # no duplicates
        assert len(set(row.tolist())) == len(row)


def test_small_build_invariants(rng):
    x = rng.standard_normal((300, 8)).astype(np.float32)
    cfg = GraphConfig(max_degree=8, l_build=16)
    idx = GraphIndex.build(x, cfg, insert_batch_size=128)
    assert idx.n == 300
    check_graph_invariants(idx)


def clustered(rng, n, nq, d, n_clusters=50, sigma=0.15):
    """Mixture-of-gaussians data + queries from the same mixture — the
    structure real ANN datasets have.  (Uniform gaussian data is degenerate
    for graph ANN: even an exact KNN graph only reaches ~0.85 recall@10 at
    L=50 on it.)"""
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)

    def draw(m):
        a = rng.integers(0, n_clusters, size=m)
        return centers[a] + sigma * rng.standard_normal((m, d)).astype(np.float32)

    return draw(n), draw(nq)


def test_recall_vs_flat(rng):
    n, d = 2000, 16
    x, q = clustered(rng, n, 100, d)
    cfg = GraphConfig(max_degree=32, l_build=50)
    idx = GraphIndex.build(x, cfg, insert_batch_size=512)
    check_graph_invariants(idx)

    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    _, ids, stats = idx.search(q, k=10, l_search=50)
    r = knn_recall(ids, gt_i, 10)
    assert r >= 0.95, r
    assert stats.cmps.mean() < n  # far fewer comparisons than brute force


def test_incremental_insert_matches_bulk(rng):
    n, d = 1000, 12
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((50, d)).astype(np.float32)
    cfg = GraphConfig(max_degree=16, l_build=32)

    idx = GraphIndex(d, cfg, capacity=256, insert_batch_size=256)
    for off in range(0, n, 333):  # ragged batches, forces growth + padding
        idx.insert(x[off : off + 333])
    assert idx.n == n
    check_graph_invariants(idx)

    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    _, ids, _ = idx.search(q, k=10, l_search=40)
    assert knn_recall(ids, gt_i, 10) >= 0.9


def test_build_ip_metric(rng):
    n, d = 800, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((40, d)).astype(np.float32)
    cfg = GraphConfig(max_degree=24, l_build=40, metric=Metric.InnerProduct)
    idx = GraphIndex.build(x, cfg, insert_batch_size=256)
    gt_d, gt_i = FlatIndex(x, Metric.InnerProduct).search(q, k=10)
    _, ids, _ = idx.search(q, k=10, l_search=40)
    assert knn_recall(ids, gt_i, 10) >= 0.85


def test_grid_2d_exact_neighbors(rng):
    # 2-D lattice: groundtruth computable by construction (reference
    # `graph/test/synthetic.rs` Grid::Two)
    g = 16
    xx, yy = np.meshgrid(np.arange(g), np.arange(g))
    x = np.stack([xx.ravel(), yy.ravel()], axis=1).astype(np.float32)
    cfg = GraphConfig(max_degree=8, l_build=20)
    idx = GraphIndex.build(x, cfg, insert_batch_size=128)
    # query at a lattice point + small offset -> nearest must be that point
    qids = rng.choice(g * g, size=20, replace=False)
    q = x[qids] + 0.1
    _, ids, _ = idx.search(q, k=1, l_search=20)
    assert (ids[:, 0] == qids).mean() >= 0.95


def test_build_capacity_override(rng):
    """Explicit capacity > n pre-allocates uniform shapes (merged shard
    builds share one compiled kernel set across shards)."""
    from diskann_tpu import GraphConfig, GraphIndex

    x = rng.standard_normal((300, 8)).astype(np.float32)
    idx = GraphIndex.build(
        x, GraphConfig(max_degree=8, l_build=16), insert_batch_size=128,
        capacity=1024,
    )
    assert idx.state.capacity == 1024
    assert idx.n == 300
    _, ids, _ = idx.search(x[:4] + 0.01, k=3, l_search=16)
    assert (ids[:, 0] >= 0).all()


def test_packed_readonly_guard(rng):
    """A read-only (writable=False) packed table refuses streaming edge
    appends with a clear error instead of corrupting."""
    import pytest as _pytest

    from diskann_tpu import GraphConfig, GraphIndex
    from diskann_tpu.graph import packed as pk

    x = rng.standard_normal((200, 8)).astype(np.float32)
    idx = GraphIndex.build(
        x, GraphConfig(max_degree=8, l_build=16), insert_batch_size=128,
    )
    idx.attach_packed(dp=8, writable=False)
    # searches work
    _, ids, _ = idx.search(x[:4] + 0.01, k=3, l_search=16, mode="packed")
    assert (ids[:, 0] >= 0).all()
    # the guard fires before any table access, so a duck-typed stand-in
    # exercises the >=2^31-word error path without an 8GB allocation
    class _BigRows:
        size = 1 << 31

    class _BigPacked:
        rows = _BigRows()

    with _pytest.raises(ValueError, match="read-only"):
        pk.append_edges(_BigPacked(), None, None, None, None)
