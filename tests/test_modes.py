"""Range / paged / diverse search modes + multi-vector Chamfer."""

import numpy as np
import pytest

from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
from diskann_tpu.graph.modes import PagedSearch, range_search, search_diverse
from diskann_tpu.ops.multivec import FlatMultiVectorIndex, chamfer_scores


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(7)
    n, d = 1200, 12
    centers = rng.standard_normal((15, d)).astype(np.float32) * 3
    a = rng.integers(0, 15, size=n)
    x = centers[a] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    idx = GraphIndex.build(x, GraphConfig(max_degree=16, l_build=32),
                           insert_batch_size=512)
    return x, idx, rng


def test_range_search(built):
    x, idx, rng = built
    q = x[:5] + 0.01
    radius = 0.5
    res = range_search(idx, q, radius, l_init=32)
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    for i in range(5):
        want = set(np.nonzero(full[i] <= radius)[0].tolist())
        got = set(res[i].tolist())
        # greedy search may miss a boundary point; require high coverage
        assert len(got & want) >= 0.9 * len(want), (i, got, want)
        assert got <= set(np.nonzero(full[i] <= radius * 1.0001)[0].tolist())


def test_paged_search(built):
    x, idx, rng = built
    q = x[10] + 0.01
    pager = PagedSearch(idx, q, l_search=26)
    p1_d, p1 = pager.next_page(5)
    p2_d, p2 = pager.next_page(5)
    assert len(p1) == 5 and len(p2) == 5
    assert not set(p1.tolist()) & set(p2.tolist())  # disjoint pages
    # pages together = one search of k=10 at the same L
    _, ids, _ = idx.search(q, k=10, l_search=26)
    assert list(p1) + list(p2) == [int(i) for i in ids[0]]
    assert (np.diff(np.concatenate([p1_d, p2_d])) >= -1e-6).all()


def test_paged_search_resumes_incrementally(built):
    """Page N must RESUME the scratch (`paged.rs:27-53`), not re-search:
    after the first page converges, later pages only pay incremental
    expansion — observable as a small cmps delta and as pages reaching
    BEYOND the first converged list."""
    x, idx, rng = built
    q = x[33] + 0.01
    pager = PagedSearch(idx, q, l_search=16)
    seen = []
    pages = 0
    while pages < 12:
        _, pi = pager.next_page(8)
        if len(pi) == 0:
            break
        assert not set(pi.tolist()) & set(seen)
        seen.extend(int(i) for i in pi)
        pages += 1
    # 12 pages x 8 = 96 > L=16: pagination reached far beyond one list
    assert len(seen) > 16
    cmps_total = int(np.asarray(pager.state.cmps)[0])
    # a from-scratch search at the equivalent L would pay ~pages x that;
    # the resumed stream shares one walk (hops accumulate, start cost once)
    assert cmps_total < pages * 1200 / 2, cmps_total


def test_grow_resume_state_larger_window(built):
    """AdaptiveL substrate: grow the scratch to a larger L and resume —
    results approach a fresh large-L search at a fraction of the extra
    cmps (the resume must NOT re-walk pass-1 ground)."""
    import jax.numpy as jnp

    from diskann_tpu.graph.scorers import full_precision_scorer
    from diskann_tpu.graph.search import (
        beam_search_scored, grow_resume_state, search_geometry,
    )

    x, idx, rng = built
    q = x[rng.integers(0, len(x), size=8)] + 0.01
    sdef, sdata = full_precision_scorer(
        idx.state.vectors, idx.state.sq_norms, idx.config.metric
    )
    start = idx._start()
    kw = dict(beam_width=idx.config.beam_width, max_hops=idx.config.max_hops,
              return_state=True)
    l1, l2 = 16, 48
    res1, st1 = beam_search_scored(
        sdef, sdata, idx.state.adjacency, start, jnp.asarray(q),
        l_search=l1, history_capacity=idx.config.history_capacity(l1), **kw
    )
    l_tot, _, h = search_geometry(
        l_search=l2, reserve=0, beam_width=idx.config.beam_width,
        r=idx.state.adjacency.shape[1], s=start.shape[-1],
        history_capacity=idx.config.history_capacity(l2),
    )
    res2, _ = beam_search_scored(
        sdef, sdata, idx.state.adjacency, start, jnp.asarray(q),
        l_search=l2, history_capacity=idx.config.history_capacity(l2),
        resume_state=grow_resume_state(st1, l_tot, h), **kw
    )
    fresh, _ = beam_search_scored(
        sdef, sdata, idx.state.adjacency, start, jnp.asarray(q),
        l_search=l2, history_capacity=idx.config.history_capacity(l2), **kw
    )
    k = 10
    ids2 = np.asarray(res2.ids)
    overlaps = []
    for b in range(len(q)):
        got = set(ids2[b, :k].tolist())
        want = set(np.asarray(fresh.ids)[b, :k].tolist())
        overlaps.append(len(got & want) / k)
        # no duplicates across the resume boundary (ring + list carry over)
        live = ids2[b][ids2[b] >= 0]
        assert len(live) == len(set(live.tolist()))
        # monotone improvement over pass 1
        assert (np.asarray(res2.dists)[b, :l1]
                <= np.asarray(res1.dists)[b, :l1] + 1e-6).all()
    assert np.mean(overlaps) >= 0.8, overlaps
    # incremental: cumulative resumed cmps < pass1 + a fresh L2 re-run
    c1 = np.asarray(res1.cmps)
    c2 = np.asarray(res2.cmps)
    cf = np.asarray(fresh.cmps)
    assert (c2 < c1 + cf).all(), (c2, c1, cf)


def test_diverse_topk_device_matches_scalar_oracle(built):
    from diskann_tpu.graph.modes import diverse_topk

    rng = np.random.default_rng(3)
    b, l, k, quota = 6, 40, 8, 2
    dists = np.sort(rng.random((b, l)).astype(np.float32), axis=1)
    ids = np.stack([
        rng.choice(500, size=l, replace=False) for _ in range(b)
    ]).astype(np.int32)
    ids[:, -5:] = -1
    dists[:, -5:] = np.inf
    attrs = rng.integers(0, 7, size=512).astype(np.int32)

    def oracle(dists, ids):
        out_d = np.full((b, k), np.inf, np.float32)
        out_i = np.full((b, k), -1, np.int64)
        for row in range(b):
            counts, n = {}, 0
            for j in range(l):
                pid = int(ids[row, j])
                if pid < 0 or n >= k:
                    break
                a = attrs[pid]
                if counts.get(a, 0) >= quota:
                    continue
                counts[a] = counts.get(a, 0) + 1
                out_d[row, n] = dists[row, j]
                out_i[row, n] = pid
                n += 1
        return out_d, out_i

    want_d, want_i = oracle(dists, ids)
    got_d, got_i = diverse_topk(dists, ids, attrs, k, quota)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_d, want_d)


def test_minmax_search_mode(built):
    x, idx, rng = built
    idx.attach_minmax()
    q = x[:40] + 0.01
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    from diskann_tpu.bench.recall import knn_recall

    _, ids, _ = idx.search(q, k=10, l_search=48, mode="minmax")
    assert knn_recall(ids, gt_i, 10) >= 0.9


def test_diverse_search(built):
    x, idx, rng = built
    attrs = rng.integers(0, 5, size=idx.state.capacity)
    q = x[:8] + 0.01
    d, ids, _ = search_diverse(idx, q, attrs, k=6, max_per_attribute=2,
                               l_search=64)
    for row in ids:
        row = row[row >= 0]
        vals, counts = np.unique(attrs[row], return_counts=True)
        assert (counts <= 2).all()


def test_chamfer_maxsim_oracle(rng):
    q = [rng.standard_normal((3, 8)).astype(np.float32)]
    docs = [rng.standard_normal((t, 8)).astype(np.float32) for t in (2, 5, 4)]
    idx = FlatMultiVectorIndex(docs, metric="maxsim")
    d, ids = idx.search(q, k=3)
    want = []
    for doc in docs:
        sims = q[0] @ doc.T
        want.append(-sims.max(axis=1).sum())
    want = np.array(want)
    order = np.argsort(want)
    np.testing.assert_array_equal(ids[0], order)
    np.testing.assert_allclose(np.sort(want), d[0], rtol=1e-4)


def test_chamfer_l2_oracle(rng):
    q = [rng.standard_normal((2, 6)).astype(np.float32)]
    docs = [rng.standard_normal((t, 6)).astype(np.float32) for t in (3, 2)]
    idx = FlatMultiVectorIndex(docs, metric="chamfer_l2")
    d, ids = idx.search(q, k=2)
    want = []
    for doc in docs:
        d2 = ((q[0][:, None, :] - doc[None, :, :]) ** 2).sum(-1)
        want.append(d2.min(axis=1).sum())
    want = np.array(want)
    np.testing.assert_allclose(d[0], np.sort(want), rtol=1e-4)


def test_determinant_diversity_matches_scalar_oracle(rng):
    """Device pivoted-Gram-Schmidt vs a direct transcription of the
    reference algorithm (`determinant_diversity.rs:326-432`)."""
    from diskann_tpu.graph.modes import determinant_diversity_device
    import jax.numpy as jnp

    b, c, d, k = 4, 24, 8, 6
    vecs = rng.standard_normal((b, c, d)).astype(np.float32)
    dists = np.sort(rng.random((b, c)).astype(np.float32), axis=1)
    valid = np.ones((b, c), bool)
    valid[:, -3:] = False
    power, eta = 1.5, 0.0

    def oracle(v, dd, ok):
        eps = np.finfo(np.float32).eps
        dmax, dmin = dd[ok].max(), dd[ok].min()
        span = max(dmax - dmin, eps)
        sim = np.maximum((dmax - dd) / span, 0.0) + eps
        r = np.where(ok[:, None], v * (sim ** power)[:, None], 0.0)
        norms = (r * r).sum(-1)
        avail = ok.copy()
        out = []
        for _ in range(k):
            cands = np.where(avail, norms, -np.inf)
            if not np.isfinite(cands).any() or (cands == -np.inf).all():
                break
            p = int(np.argmax(cands))
            out.append(p)
            avail[p] = False
            bn = norms[p]
            if bn <= 0:
                continue
            rs = r[p].copy()
            proj = np.where(avail, (r @ rs) / bn, 0.0)
            r = r - proj[:, None] * rs[None, :]
            norms = np.maximum(norms - proj * proj * bn, 0.0)
        return out

    sel = np.asarray(determinant_diversity_device(
        jnp.asarray(vecs), jnp.asarray(dists), jnp.asarray(valid),
        k, power=power, eta=eta,
    ))
    for row in range(b):
        want = oracle(vecs[row], dists[row], valid[row])
        got = [int(x) for x in sel[row] if x >= 0]
        assert got == want, (row, got, want)


def test_determinant_rerank_end_to_end(built):
    from diskann_tpu.graph.modes import determinant_rerank

    x, idx, rng = built
    q = x[:6] + 0.01
    d, ids, _ = determinant_rerank(idx, q, k=5, l_search=40, power=2.0)
    assert ids.shape == (6, 5)
    assert (ids >= 0).all()
    # first pick is the highest-relevance-scaled candidate; with power=2 the
    # nearest neighbor dominates, so top-1 matches plain search
    _, plain, _ = idx.search(q, k=1, l_search=40)
    assert (ids[:, 0] == plain[:, 0]).mean() >= 0.8
    # no duplicates within a row
    for row in ids:
        assert len(set(row.tolist())) == len(row)


def test_range_search_no_silent_truncation(built):
    """A radius containing MORE points than the window cap must either keep
    growing past it (default l_max) or report complete=False — never a
    silently partial set (`range_search.rs` semantics + completeness)."""
    x, idx, rng = built
    q = x[3:4] + 0.01
    # radius covering the whole dataset (>1024 points in range, n=1200)
    radius = float(((q[:, None, :] - x[None, :, :]) ** 2).sum(-1).max()) + 1.0
    res, complete = range_search(
        idx, q, radius, l_init=32, l_max=4096, return_complete=True
    )
    assert complete[0]
    assert len(res[0]) > 1024                       # past the old hard cap
    assert len(res[0]) >= 0.95 * len(x)             # essentially everything
    # with a cap below the in-range count, the flag must say INCOMPLETE
    res2, complete2 = range_search(
        idx, q, radius, l_init=32, l_max=256, return_complete=True
    )
    assert not complete2[0]
    assert len(res2[0]) <= 256


def test_range_search_resume_matches_restart(built):
    """The resume-based L-growth rounds return the same in-range sets as
    fresh re-searches (boundary queries, mid-size radius)."""
    x, idx, rng = built
    q = x[7:12] + 0.01
    radius = 2.0
    a = range_search(idx, q, radius, l_init=32, resume=True)
    b = range_search(idx, q, radius, l_init=32, resume=False)
    for i in range(len(a)):
        ja = set(a[i].tolist())
        jb = set(b[i].tolist())
        union = max(len(ja | jb), 1)
        assert len(ja & jb) / union >= 0.95, (i, ja ^ jb)


def test_diverse_traversal_finds_beyond_L(rng):
    """The reference's DiversePriorityQueue keeps walking until quota-
    satisfying results are found even when they lie beyond a plain top-L
    window (`diverse_search.rs:104`).  Construct that exact regime: 300
    attr-0 points blanket the query, 40 attr-1 points sit far away — the
    plain top-L list is pure attr-0, so post-process enforcement cannot
    return attr-1 results, while in-traversal quota enforcement must.
    (Reachability caveat shared with the reference: the walk crosses to the
    far cluster through alpha-pruned long edges, so the A cluster is kept
    small enough that the quota-surviving nodes carry some A->B edge.)"""
    n_a, n_b, d = 150, 60, 8
    xa = 0.1 * rng.standard_normal((n_a, d)).astype(np.float32)
    xb = (3.0 + 0.1 * rng.standard_normal((n_b, d))).astype(np.float32)
    x = np.concatenate([xa, xb]).astype(np.float32)
    attrs = np.concatenate([np.zeros(n_a), np.ones(n_b)]).astype(np.int64)
    idx = GraphIndex.build(x, GraphConfig(max_degree=16, l_build=48),
                           insert_batch_size=128)
    pad = np.zeros((idx.state.capacity,), np.int64)
    pad[: n_a + n_b] = attrs
    q = np.zeros((4, d), np.float32)

    k, quota, l = 10, 5, 48
    _, ids_post, _ = search_diverse(idx, q, pad, k=k, max_per_attribute=quota,
                                    l_search=l, enforce="post")
    _, ids_trav, _ = search_diverse(idx, q, pad, k=k, max_per_attribute=quota,
                                    l_search=l, enforce="traversal",
                                    beam_width=4)
    for row in ids_trav:
        row = row[row >= 0]
        vals, counts = np.unique(pad[row], return_counts=True)
        assert (counts <= quota).all()
    # the top-32 by distance is pure attr-0: post enforcement finds no
    # attr-1 members, the traversal quota must find the full 5
    n1_post = (pad[ids_post[ids_post >= 0]] == 1).sum()
    n1_trav = int((pad[ids_trav[ids_trav >= 0]] == 1).sum())
    assert n1_post == 0, n1_post
    assert n1_trav >= 4 * quota - 4, n1_trav  # >= 4 of 5 per query, 4 queries
    # and the attr-1 results must be (near-)nearest attr-1 points
    gt_b = FlatIndex(x[n_a:], Metric.L2).search(q, k=quota)[1] + n_a
    for bi in range(4):
        got = set(ids_trav[bi][pad[np.maximum(ids_trav[bi], 0)] == 1].tolist())
        want = set(gt_b[bi].tolist())
        assert len(got & want) >= quota - 1, (got, want)
