"""Systematic mutation-interleaving stress (the race-detector analogue).

The reference leans on sanitizers/loom-style tools to validate its
EBR/lock concurrency (SURVEY §5 A2).  This repo's functional state makes
data races unrepresentable by construction — the remaining analogue of a
race detector is SCHEDULE coverage: drive long seeded random interleavings
of every mutating op (insert / delete[method,repair] / consolidate /
search) and re-check EVERY structural invariant after EVERY step, so any
ordering-dependent state corruption surfaces deterministically with the
failing schedule's seed.
"""

import numpy as np
import pytest

from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
from diskann_tpu.bench.recall import knn_recall


def check_invariants(idx, ctx):
    """Every structural invariant from CLAUDE.md, in one sweep."""
    n = idx.state.capacity
    adj = np.asarray(idx.state.adjacency)
    degs = np.asarray(idx.state.degrees)
    valid = np.asarray(idx.state.valid)
    rs = idx.state.max_degree_slack
    assert adj.shape[1] == rs
    # degree counts match row contents
    np.testing.assert_array_equal(degs, (adj >= 0).sum(axis=1), err_msg=ctx)
    # no self loops
    assert not (adj == np.arange(n)[:, None]).any(), ctx
    # no dups within a row
    srt = np.sort(np.where(adj < 0, 2**31 - 1, adj), axis=1)
    dup = (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] < 2**31 - 1)
    assert not dup.any(), ctx
    # dead rows are cleared; nothing points outside capacity
    assert (adj[~valid] == -1).all(), ctx
    assert adj.max() < n, ctx
    # packed mirror (when attached) matches adjacency exactly
    if idx.packed is not None:
        from diskann_tpu.graph.packed import logical_rows

        rows_np = np.asarray(logical_rows(idx.packed))[:n]
        np.testing.assert_array_equal(rows_np[:, : adj.shape[1]], adj,
                                      err_msg=ctx)
    # live accounting
    assert valid.sum() == idx.n_live, ctx


@pytest.mark.parametrize("seed", [0, 1])
def test_mutation_interleaving_stress(seed):
    """200 random mutation steps; invariants checked after every one."""
    rng = np.random.default_rng(seed)
    d = 16
    centers = rng.standard_normal((16, d)).astype(np.float32)

    def make(m):
        a = rng.integers(0, 16, size=m)
        return (centers[a] + 0.2 * rng.standard_normal((m, d))).astype(
            np.float32
        )

    x0 = make(600)
    idx = GraphIndex.build(
        x0, GraphConfig(max_degree=12, l_build=24), insert_batch_size=256,
        build_mode="packed", packed_dp=16, capacity=1400,
    )
    live = {i: x0[i] for i in range(600)}
    check_invariants(idx, "post-build")

    methods = ["scan", "one_hop", "two_hop_one_hop", "visited_topk"]
    repairs = ["prune", "fill"]
    for step in range(200):
        op = rng.choice(["insert", "delete", "search", "consolidate"],
                        p=[0.35, 0.35, 0.25, 0.05])
        ctx = f"seed={seed} step={step} op={op}"
        if op == "insert" and len(live) < 1200:
            v = make(int(rng.integers(1, 40)))
            ids = idx.insert(v)
            for j, s in enumerate(ids):
                live[int(s)] = v[j]
        elif op == "delete" and len(live) > 100:
            kill = rng.choice(np.array(sorted(live)),
                              size=int(rng.integers(1, 40)), replace=False)
            m = methods[rng.integers(0, len(methods))]
            r = repairs[rng.integers(0, len(repairs))]
            ctx += f" method={m} repair={r}"
            idx.delete(kill, method=m, repair=r)
            for i in kill:
                del live[i]
        elif op == "search":
            q = make(8)
            _, ids, _ = idx.search(q, k=5, l_search=24)
            dead = ids[ids >= 0][~np.isin(ids[ids >= 0],
                                          np.array(sorted(live)))]
            assert dead.size == 0, (ctx, dead)
            continue  # read-only: invariant sweep unnecessary
        else:
            idx.consolidate()
            if idx.packed is not None:
                # consolidate patches adjacency outside inplace_delete's
                # mirror upkeep; re-mirror like the maintenance loop does
                from diskann_tpu.graph import packed as pk
                import jax.numpy as jnp

                stale = np.arange(idx.state.capacity, dtype=np.int32)
                for off in range(0, len(stale), 1024):
                    idx.packed = pk.refresh_rows_donated(
                        idx.packed, idx.state.adjacency,
                        jnp.asarray(stale[off:off + 1024]),
                    )
        if step % 10 == 0 or op == "delete":
            check_invariants(idx, ctx)

    # the surviving structure still answers queries well
    ids_live = np.array(sorted(live))
    lv = np.stack([live[i] for i in ids_live])
    q = lv[rng.choice(len(lv), size=40, replace=False)] + 0.02
    _, gt_i = FlatIndex(lv, Metric.L2).search(q, k=10)
    _, got, _ = idx.search(q, k=10, l_search=48)
    assert knn_recall(got, ids_live[gt_i], 10) >= 0.8
