"""Streaming delete tests (IP-DiskANN semantics)."""

import numpy as np
import pytest

from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
from diskann_tpu.bench.recall import knn_recall


def build_clustered(rng, n=1200, d=12):
    centers = rng.standard_normal((20, d)).astype(np.float32)
    a = rng.integers(0, 20, size=n)
    x = centers[a] + 0.1 * rng.standard_normal((n, d)).astype(np.float32)
    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = GraphIndex.build(x, cfg, insert_batch_size=512)
    return x, idx, centers


def test_deleted_never_returned(rng):
    x, idx, centers = build_clustered(rng)
    dead = rng.choice(len(x), size=200, replace=False)
    idx.delete(dead)
    q = x[dead[:50]] + 0.01  # query right at deleted points
    _, ids, _ = idx.search(q, k=10, l_search=40)
    assert not np.isin(ids[ids >= 0], dead).any()
    assert idx.n_live == len(x) - 200


def test_no_dangling_references_after_delete(rng):
    x, idx, _ = build_clustered(rng)
    dead = rng.choice(len(x), size=150, replace=False)
    idx.delete(dead)
    adj = np.asarray(idx.state.adjacency[: idx.n])
    live_entries = adj[adj >= 0]
    assert not np.isin(live_entries, dead).any()
    # deleted rows are cleared
    assert (adj[dead] == -1).all()


def test_recall_stable_after_delete(rng):
    x, idx, _ = build_clustered(rng, n=1500)
    dead = rng.choice(len(x), size=300, replace=False)
    alive = np.setdiff1d(np.arange(len(x)), dead)
    idx.delete(dead)

    q = x[alive[:80]] + 0.02
    flat = FlatIndex(x[alive], Metric.L2)
    gt_d, gt_i = flat.search(q, k=10)
    gt_ids = alive[gt_i]  # map back to original id space
    _, ids, _ = idx.search(q, k=10, l_search=48)
    r = knn_recall(ids, gt_ids, 10)
    assert r >= 0.9, r


def test_delete_then_consolidate_idempotent(rng):
    x, idx, _ = build_clustered(rng)
    idx.delete(rng.choice(len(x), size=100, replace=False))
    from diskann_tpu.graph.delete import rows_referencing_deleted

    assert not np.asarray(rows_referencing_deleted(idx.state)).any()
    idx.consolidate()  # no-op, must not crash
    assert idx.n_live == len(x) - 100


def test_packed_layout_consistent_after_delete(rng):
    from diskann_tpu.graph import packed as pk
    import jax.numpy as jnp

    n, d = 800, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = GraphIndex.build(x, GraphConfig(max_degree=12, l_build=24),
                           insert_batch_size=256, build_mode="packed",
                           packed_dp=16)
    dead = rng.choice(n, size=120, replace=False)
    idx.delete(dead)
    # packed fat rows must mirror adjacency exactly after the delete repair
    p = idx.packed
    adj = np.asarray(idx.state.adjacency)
    from diskann_tpu.graph.packed import logical_rows

    rows_np = np.asarray(logical_rows(p))[: adj.shape[0]]  # drop the dump row
    ids = rows_np[:, : adj.shape[1]]
    aux = rows_np[:, p.aux_off_w : p.aux_off_w + adj.shape[1]].view(np.float32)
    np.testing.assert_array_equal(ids, adj)
    live_slots = adj >= 0
    assert (np.isfinite(aux) == live_slots).all()
    # searching the packed layout never returns deleted ids
    _, ids, _ = idx.search(x[dead[:10]] + 0.01, k=5, l_search=24, mode="packed")
    assert not np.isin(ids[ids >= 0], dead).any()


@pytest.mark.parametrize("method", ["scan", "two_hop_one_hop"])
def test_fill_repair_invariants(rng, method):
    """The prune-free "fill" repair (reference index.rs:1558 patch-then-
    maybe-prune) keeps every adjacency invariant: no dangling refs in
    patched rows' neighborhoods, no dups, no self-loops, degrees match,
    rows never exceed the slack capacity."""
    x, idx, _ = build_clustered(rng, n=1400)
    dead = rng.choice(len(x), size=250, replace=False)
    alive = np.setdiff1d(np.arange(len(x)), dead)
    idx.delete(dead, method=method, repair="fill")
    assert idx.n_live == len(x) - 250
    adj = np.asarray(idx.state.adjacency[: idx.n])
    degs = np.asarray(idx.state.degrees[: idx.n])
    assert (adj[dead] == -1).all()
    rs = idx.state.max_degree_slack
    for i in alive:
        row = adj[i][adj[i] >= 0]
        assert len(row) == degs[i], i
        assert len(row) <= rs
        assert len(np.unique(row)) == len(row), i  # no dups
        assert i not in row                        # no self-loop
    if method == "scan":  # exact affected set -> zero dangling refs
        live_entries = adj[alive][adj[alive] >= 0]
        assert not np.isin(live_entries, dead).any()
    # graph stays searchable at good recall
    q = x[alive[:60]] + 0.02
    _, ids, _ = idx.search(q, k=10, l_search=48)
    assert not np.isin(ids[ids >= 0], dead).any()
    flat = FlatIndex(x[alive], Metric.L2)
    _, gt_i = flat.search(q, k=10)
    assert knn_recall(ids, alive[gt_i], 10) >= 0.85


def test_fill_repair_churn_stability(rng):
    """Repeated delete/insert churn with the fill repair: recall must not
    decay (the fill rows re-tighten through insert backedge prunes)."""
    n, d = 1000, 16
    centers = rng.standard_normal((20, d)).astype(np.float32)

    def make(m):
        a = rng.integers(0, 20, size=m)
        return (centers[a] + 0.15 * rng.standard_normal((m, d))).astype(
            np.float32
        )

    x = make(n)
    idx = GraphIndex.build(x, GraphConfig(max_degree=16, l_build=32),
                           insert_batch_size=256)
    live = {i: x[i] for i in range(n)}
    recalls = []
    for cycle in range(6):
        ids_live = np.array(sorted(live))
        kill = rng.choice(ids_live, size=len(ids_live) // 4, replace=False)
        idx.delete(kill, method="scan", repair="fill")
        for i in kill:
            del live[i]
        newv = make(len(kill))
        slots = idx.insert(newv)
        for j, s in enumerate(slots):
            live[int(s)] = newv[j]
        ids_live = np.array(sorted(live))
        lv = np.stack([live[i] for i in ids_live])
        q = lv[rng.choice(len(lv), size=50, replace=False)] + 0.02
        flat = FlatIndex(lv, Metric.L2)
        _, gt_i = flat.search(q, k=10)
        _, got, _ = idx.search(q, k=10, l_search=48)
        recalls.append(knn_recall(got, ids_live[gt_i], 10))
    assert min(recalls) >= 0.85, recalls
    assert np.mean(recalls[3:]) >= np.mean(recalls[:3]) - 0.05, recalls


@pytest.mark.parametrize(
    "method", ["one_hop", "two_hop_one_hop", "visited_topk"]
)
def test_delete_methods(rng, method):
    """All three reference InplaceDeleteMethod policies (`graph/misc.rs:27`)
    keep the graph searchable; deleted ids never surface."""
    x, idx, _ = build_clustered(rng, n=1400)
    dead = rng.choice(len(x), size=250, replace=False)
    alive = np.setdiff1d(np.arange(len(x)), dead)
    idx.delete(dead, method=method, k_value=12)
    assert idx.n_live == len(x) - 250
    # deleted rows dropped, deleted ids never returned
    adj = np.asarray(idx.state.adjacency[: idx.n])
    assert (adj[dead] == -1).all()
    q = x[alive[:60]] + 0.02
    _, ids, _ = idx.search(q, k=10, l_search=48)
    assert not np.isin(ids[ids >= 0], dead).any()
    flat = FlatIndex(x[alive], Metric.L2)
    _, gt_i = flat.search(q, k=10)
    r = knn_recall(ids, alive[gt_i], 10)
    assert r >= 0.85, (method, r)
    # the approximate methods may leave dangling refs outside their
    # neighborhood approximation; consolidate sweeps them (index.rs:1756)
    idx.consolidate()
    from diskann_tpu.graph.delete import rows_referencing_deleted

    assert not np.asarray(rows_referencing_deleted(idx.state)).any()


def test_churn_stability_50pct(rng):
    """50% insert/delete churn over 10 cycles: recall stays stable
    (IP-DiskANN / Fresh-DiskANN claim, the streaming harness workload
    `diskann-benchmark-core/src/streaming/graph/inplace_delete.rs`)."""
    n, d = 1200, 16
    centers = rng.standard_normal((24, d)).astype(np.float32)

    def make(m):
        a = rng.integers(0, 24, size=m)
        return (centers[a] + 0.15 * rng.standard_normal((m, d))).astype(
            np.float32
        )

    x = make(n)
    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = GraphIndex.build(x, cfg, insert_batch_size=256)
    live_vecs = {i: x[i] for i in range(n)}
    ids_of = dict(zip(range(n), range(n)))  # logical -> internal
    recalls = []
    for cycle in range(10):
        # delete 50% of live points
        live_ids = np.array(sorted(live_vecs))
        kill = rng.choice(live_ids, size=len(live_ids) // 2, replace=False)
        idx.delete([ids_of[i] for i in kill],
                   method="two_hop_one_hop" if cycle % 2 else "one_hop")
        for i in kill:
            del live_vecs[i], ids_of[i]
        # insert the same number of new points
        newv = make(len(kill))
        slots = idx.insert(newv)
        base = max(ids_of) + 1 if ids_of else 0
        for j, s in enumerate(slots):
            live_vecs[base + j] = newv[j]
            ids_of[base + j] = int(s)
        # measure recall over the live set
        live_ids = np.array(sorted(live_vecs))
        lv = np.stack([live_vecs[i] for i in live_ids])
        q = lv[rng.choice(len(lv), size=50, replace=False)] + 0.02
        flat = FlatIndex(lv, Metric.L2)
        _, gt_i = flat.search(q, k=10)
        gt_internal = np.vectorize(lambda i: ids_of[i])(live_ids[gt_i])
        _, got, _ = idx.search(q, k=10, l_search=48)
        recalls.append(knn_recall(got, gt_internal, 10))
    # stable: no collapse over cycles, and the tail is as good as the head
    assert min(recalls) >= 0.85, recalls
    assert np.mean(recalls[5:]) >= np.mean(recalls[:5]) - 0.05, recalls
