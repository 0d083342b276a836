"""Beam-search tests against the scalar oracle and synthetic lattices
(mirrors `diskann/src/graph/test/synthetic.rs` grid cases)."""

import numpy as np
import jax.numpy as jnp
import pytest

from diskann_tpu.graph.search import beam_search
from diskann_tpu.ops.distance import Metric, squared_norms

from reference_impl import greedy_search


def random_graph(rng, n, r):
    """A random r-regular-ish directed graph with no self loops."""
    adj = np.full((n, r), -1, np.int32)
    for i in range(n):
        choices = rng.choice(n - 1, size=min(r, n - 1), replace=False)
        choices[choices >= i] += 1
        adj[i, : len(choices)] = choices
    return adj


def run_beam(vectors, adj, start, queries, l, w=1):
    v = jnp.asarray(vectors)
    return beam_search(
        v,
        squared_norms(v),
        jnp.asarray(adj),
        jnp.asarray(start, jnp.int32),
        jnp.asarray(queries),
        metric=Metric.L2,
        l_search=l,
        beam_width=w,
        # large ring -> exact visited-set semantics for oracle parity
        history_capacity=16384,
    )


def test_matches_scalar_oracle(rng):
    n, d, r, l = 200, 8, 6, 10
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    adj = random_graph(rng, n, r)
    queries = rng.standard_normal((4, d)).astype(np.float32)
    res = run_beam(vectors, adj, [0], queries, l)
    for b in range(4):
        want, want_cmps = greedy_search(vectors, adj, [0], queries[b], l)
        got = [int(i) for i in res.ids[b] if i >= 0]
        assert got == want, (b, got, want)
        assert int(res.cmps[b]) == want_cmps


def test_fully_connected_graph_is_exact(rng):
    # every node points at all others -> search with L>=n is exhaustive
    n, d = 60, 4
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    adj = np.array(
        [[j for j in range(n) if j != i] for i in range(n)], dtype=np.int32
    )
    queries = rng.standard_normal((3, d)).astype(np.float32)
    res = run_beam(vectors, adj, [0], queries, l=n)
    full = ((queries[:, None, :] - vectors[None, :, :]) ** 2).sum(-1)
    want = np.argsort(full, axis=1)
    for b in range(3):
        got = [int(i) for i in res.ids[b] if i >= 0]
        assert got[:10] == list(want[b][:10])


def test_chain_graph_walks_to_target(rng):
    # 1-D lattice, chain adjacency: greedy must walk the line to the nearest
    n = 50
    vectors = np.arange(n, dtype=np.float32)[:, None]
    adj = np.full((n, 2), -1, np.int32)
    adj[:, 0] = np.arange(n) - 1
    adj[:, 1] = np.arange(n) + 1
    adj[0, 0] = -1
    adj[n - 1, 1] = -1
    queries = np.array([[37.2], [3.9], [0.0]], np.float32)
    res = run_beam(vectors, adj, [25], queries, l=4)
    assert int(res.ids[0, 0]) == 37
    assert int(res.ids[1, 0]) == 4
    assert int(res.ids[2, 0]) == 0


def test_beam_width_preserves_results(rng):
    n, d, r = 300, 8, 8
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    adj = random_graph(rng, n, r)
    queries = rng.standard_normal((5, d)).astype(np.float32)
    r1 = run_beam(vectors, adj, [0], queries, l=16, w=1)
    r4 = run_beam(vectors, adj, [0], queries, l=16, w=4)
    # Wider beams explore a different (usually larger) node set; quality must
    # stay comparable though individual queries may differ slightly.
    d1 = np.asarray(r1.dists[:, 0])
    d4 = np.asarray(r4.dists[:, 0])
    assert d4.mean() <= d1.mean() * 1.25 + 1e-5
    assert np.asarray(r4.hops).sum() >= np.asarray(r1.hops).sum()


def test_record_pool_collects_expanded(rng):
    n, d, r, l = 100, 4, 5, 8
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    adj = random_graph(rng, n, r)
    queries = rng.standard_normal((2, d)).astype(np.float32)
    v = jnp.asarray(vectors)
    res = beam_search(
        v, squared_norms(v), jnp.asarray(adj), jnp.asarray([0], jnp.int32),
        jnp.asarray(queries), metric=Metric.L2, l_search=l,
        record_pool=True, pool_capacity=256,
    )
    for b in range(2):
        pn = int(res.pool_n[b])
        assert pn == int(res.hops[b])
        pool = np.asarray(res.pool_i[b])
        pool = pool[pool >= 0]  # stride-W pool has holes for converged rows
        assert len(pool) == pn
        assert len(set(pool.tolist())) == pn  # each node expanded once


def test_invalid_start_means_empty_result(rng):
    vectors = rng.standard_normal((10, 4)).astype(np.float32)
    adj = random_graph(rng, 10, 3)
    queries = rng.standard_normal((2, 4)).astype(np.float32)
    res = run_beam(vectors, adj, [-1], queries, l=4)
    assert (np.asarray(res.ids) == -1).all()
    assert (np.asarray(res.cmps) == 0).all()


def test_router_start_points(rng):
    """Per-query router entry points keep recall and cut hops vs the
    single-medoid walk (GraphConfig.router_size / router_starts)."""
    from diskann_tpu.flat.index import FlatIndex
    from diskann_tpu.graph.config import GraphConfig
    from diskann_tpu.graph.index import GraphIndex

    n, d = 3000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((64, d)).astype(np.float32)
    cfg_router = GraphConfig(
        max_degree=16, l_build=32, router_size=256, router_starts=2
    )
    idx = GraphIndex.build(x, cfg_router, insert_batch_size=1024)
    _, gt = FlatIndex(x, Metric.L2).search(q, k=5)

    _, ids_m, st_m = idx.search(q, 5, l_search=32)           # router active
    rec = np.mean([
        len(set(ids_m[i]) & set(np.asarray(gt)[i])) / 5 for i in range(64)
    ])
    assert rec >= 0.9, rec
    # router actually produced per-query starts
    starts = idx._router_starts(jnp.asarray(q), "full")
    assert starts is not None and starts.shape == (64, 2)
    # starts are live node ids
    s = np.asarray(starts)
    assert ((s >= 0) & (s < n)).all()
    # disabling the router (router_size=0) must also work and agree on recall
    object.__setattr__(idx.config, "router_size", 0)
    idx._router_ids = None
    _, ids_0, st_0 = idx.search(q, 5, l_search=32)
    rec0 = np.mean([
        len(set(ids_0[i]) & set(np.asarray(gt)[i])) / 5 for i in range(64)
    ])
    assert rec0 >= 0.9, rec0
    # router path should not expand more nodes than the medoid path
    assert st_m.hops.mean() <= st_0.hops.mean() + 1


def test_router_starts_override(rng):
    """search(router_starts=) overrides config.router_starts per call, for
    both the full-precision path and the composed quant path: more starts
    seed a better initial list (fewer hops at equal recall)."""
    from diskann_tpu.flat.index import FlatIndex
    from diskann_tpu.graph.config import GraphConfig
    from diskann_tpu.graph.index import GraphIndex

    n, d = 3000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((64, d)).astype(np.float32)
    cfg = GraphConfig(
        max_degree=16, l_build=32, router_size=256, router_starts=2
    )
    idx = GraphIndex.build(x, cfg, insert_batch_size=1024)
    _, gt = FlatIndex(x, Metric.L2).search(q, k=5)

    def recall(ids):
        return np.mean([
            len(set(ids[i]) & set(np.asarray(gt)[i])) / 5 for i in range(64)
        ])

    # full-precision path: the override reaches _router_starts
    starts8 = idx._router_starts(jnp.asarray(q), "full", 8)
    assert starts8 is not None and starts8.shape == (64, 8)
    _, ids8, st8 = idx.search(q, 5, l_search=32, router_starts=8)
    assert recall(ids8) >= 0.9
    # more starts never hurt convergence (hops within +1 of default)
    _, _, st2 = idx.search(q, 5, l_search=32)
    assert st8.hops.mean() <= st2.hops.mean() + 1

    # composed quant path (packed traversal) honors the override too
    idx.attach_packed(dp=16)
    _, ids_p, _ = idx.search(q, 5, l_search=32, mode="packed",
                             router_starts=8)
    assert recall(ids_p) >= 0.85


def test_l1_metric_end_to_end(rng):
    """L1 traversal on a fully connected graph is exact (the L1 analogue of
    test_fully_connected_graph_is_exact; reference `L1NormFunctor`,
    `diskann-vector/src/distance/implementations.rs:413`)."""
    n, d, k = 60, 12, 5
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    adj = np.tile(np.arange(n, dtype=np.int32), (n, 1))
    queries = rng.standard_normal((3, d)).astype(np.float32)
    v = jnp.asarray(vectors)
    res = beam_search(
        v, squared_norms(v), jnp.asarray(adj),
        jnp.asarray([0], jnp.int32), jnp.asarray(queries),
        metric=Metric.L1, l_search=k, history_capacity=16384,
    )
    full = np.abs(queries[:, None, :] - vectors[None, :, :]).sum(-1)
    want = np.sort(full, axis=1)[:, :k]
    np.testing.assert_allclose(
        np.asarray(res.dists)[:, :k], want, rtol=1e-4, atol=1e-4
    )


def test_start_point_strategies(rng):
    """The reference's StartPointStrategy family (`start_point.rs:19-41`):
    every strategy yields live entry ids and a working search; recall holds
    for the multi-start strategies."""
    from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
    from diskann_tpu.bench.recall import knn_recall

    n, d = 1500, 24
    centers = rng.standard_normal((20, d)).astype(np.float32) * 2
    x = centers[rng.integers(0, 20, size=n)] + 0.3 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    q = centers[rng.integers(0, 20, size=30)] + 0.3 * rng.standard_normal(
        (30, d)
    ).astype(np.float32)
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)

    idx = GraphIndex.build(x, GraphConfig(max_degree=16, l_build=32),
                           insert_batch_size=512)
    valid = np.asarray(idx.state.valid)
    for strat, k in (("medoid", 1), ("first_vector", 1),
                     ("random_samples", 4), ("latin_hypercube", 4),
                     ("random_vectors", 4)):
        idx.set_start_strategy(strat, k=k, seed=7)
        starts = np.asarray(idx._start())
        assert (starts >= 0).all() and valid[starts].all(), strat
        if strat in ("first_vector",):
            continue  # single fixed start: liveness is the contract
        _, ids, _ = idx.search(q, 10, l_search=48)
        assert knn_recall(ids, gt_i, 10) >= 0.9, strat
    with pytest.raises(ValueError, match="unknown start strategy"):
        idx.set_start_strategy("nope")
    idx.set_start_strategy()  # back to the default


def test_search_mode_auto_routes_flat_then_graph(rng):
    """mode="auto" (VERDICT r4 item 7): below the N*d crossover the search
    routes to the exact masked MXU flat scan (hops==0, exact results, deleted
    ids never surface); forcing the crossover to 0 routes the same call to
    the graph walk.  Reference analogue: the standalone FlatIndex
    (`diskann/src/flat/mod.rs:6-30`)."""
    import diskann_tpu.graph.index as gidx
    from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric

    n, d = 1200, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((40, d)).astype(np.float32)
    idx = GraphIndex.build(x, GraphConfig(max_degree=16, l_build=32),
                           insert_batch_size=512)
    dead = rng.choice(n, size=60, replace=False)
    idx.delete(dead)

    fd, fi, stats = idx.search(q, 10, mode="auto")
    assert (stats.hops == 0).all()          # flat path marker
    assert not np.isin(fi, dead).any()
    live = np.setdiff1d(np.arange(n), dead)
    gt_d = ((q[:, None, :] - x[None, live, :]) ** 2).sum(-1)
    gt = live[np.argsort(gt_d, axis=1)[:, :10]]
    np.testing.assert_array_equal(np.sort(fi, 1), np.sort(gt, 1))
    np.testing.assert_allclose(
        fd, np.sort(gt_d, axis=1)[:, :10], rtol=1e-3, atol=1e-3
    )

    # force the graph side of the router
    old = gidx.FLAT_AUTO_CROSSOVER
    gidx.FLAT_AUTO_CROSSOVER = 0
    try:
        _, fi2, stats2 = idx.search(q, 10, mode="auto", l_search=48)
    finally:
        gidx.FLAT_AUTO_CROSSOVER = old
    assert (stats2.hops > 0).any()          # walked the graph
    from diskann_tpu.bench.recall import knn_recall
    assert knn_recall(fi2, gt, 10) >= 0.9
