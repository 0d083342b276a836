"""Label-filter tests: predicate parsing, bitsets, inline filtered search."""

import numpy as np
import pytest

from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
from diskann_tpu.bench.recall import knn_recall
from diskann_tpu.filters import LabelSet, parse_predicate, compile_accept
from diskann_tpu.filters.predicate import And, Label, Not, Or

import jax.numpy as jnp


def test_parse_predicate():
    p = parse_predicate("a & (b | !c)")
    assert p == And(Label("a"), Or(Label("b"), Not(Label("c"))))
    assert parse_predicate("x") == Label("x")
    assert parse_predicate("a AND b OR c") == Or(And(Label("a"), Label("b")), Label("c"))
    with pytest.raises(ValueError):
        parse_predicate("a &")


def test_labelset_bitset(rng):
    labels = [["red"], ["blue"], ["red", "blue"], [], ["green"]]
    ls = LabelSet.from_lists(labels)
    np.testing.assert_array_equal(ls.members("red"), [0, 2])
    np.testing.assert_array_equal(ls.members("blue"), [1, 2])
    ids = jnp.asarray([0, 1, 2, 3, 4, -1])
    got = np.asarray(ls.test("red", ids))
    np.testing.assert_array_equal(got, [True, False, True, False, False, False])


def test_compile_accept_matches_python_eval(rng):
    labels = [
        [l for l in ["a", "b", "c"] if rng.random() < 0.4] for _ in range(200)
    ]
    ls = LabelSet.from_lists(labels)
    for expr in ["a", "a & b", "a | c", "!(a | b) & c", "a & !b | c"]:
        pred = parse_predicate(expr)
        fn = compile_accept(pred, ls.vocab, ls.capacity)
        ids = jnp.arange(200, dtype=jnp.int32)[None, :]
        got = np.asarray(fn(ls.bits, ids, jnp.ones_like(ids, bool)))[0]

        def py_eval(p, i):
            if isinstance(p, Label):
                return p.name in labels[i]
            if isinstance(p, And):
                return py_eval(p.left, i) and py_eval(p.right, i)
            if isinstance(p, Or):
                return py_eval(p.left, i) or py_eval(p.right, i)
            if isinstance(p, Not):
                return not py_eval(p.inner, i)

        want = np.array([py_eval(pred, i) for i in range(200)])
        np.testing.assert_array_equal(got, want, err_msg=expr)


def test_filtered_search(rng):
    n, d = 1500, 16
    centers = rng.standard_normal((20, d)).astype(np.float32) * 2
    a = rng.integers(0, 20, size=n)
    x = centers[a] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
    # ~30% of points carry "hot", orthogonal to geometry
    hot = rng.random(n) < 0.3
    labels = [["hot"] if h else ["cold"] for h in hot]

    idx = GraphIndex.build(x, GraphConfig(max_degree=16, l_build=32),
                           insert_batch_size=512)
    idx.attach_labels(labels)

    q = centers[rng.integers(0, 20, size=40)] + 0.15 * rng.standard_normal(
        (40, d)
    ).astype(np.float32)
    d_, ids, stats = idx.search_filtered(q, "hot", k=10, l_search=48)

    # every returned id matches the filter
    ret = ids[ids >= 0]
    assert hot[ret].all()
    # recall vs exact filtered groundtruth
    hot_ids = np.nonzero(hot)[0]
    flat = FlatIndex(x[hot_ids], Metric.L2)
    _, gi = flat.search(q, k=10)
    gt = hot_ids[gi]
    assert knn_recall(ids, gt, 10) >= 0.85


def test_filtered_search_rare_label_adaptive(rng):
    n, d = 1000, 12
    x = rng.standard_normal((n, d)).astype(np.float32)
    rare = rng.random(n) < 0.03
    rare[:5] = True  # ensure a few
    labels = [["rare"] if r else ["common"] for r in rare]
    idx = GraphIndex.build(x, GraphConfig(max_degree=16, l_build=32),
                           insert_batch_size=512)
    idx.attach_labels(labels)
    _, ids, _ = idx.search_filtered(x[:10] + 0.01, "rare", k=5, l_search=16)
    ret = ids[ids >= 0]
    assert len(ret) > 0
    assert rare[ret].all()


def test_multihop_filtered_search(rng):
    n, d = 1500, 16
    centers = rng.standard_normal((20, d)).astype(np.float32) * 2
    a = rng.integers(0, 20, size=n)
    x = centers[a] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
    hot = rng.random(n) < 0.15  # sparse filter: multihop's sweet spot
    labels = [["hot"] if h else ["cold"] for h in hot]

    idx = GraphIndex.build(x, GraphConfig(max_degree=16, l_build=32),
                           insert_batch_size=512)
    idx.attach_labels(labels)

    q = centers[rng.integers(0, 20, size=30)] + 0.15 * rng.standard_normal(
        (30, d)
    ).astype(np.float32)
    d_, ids, _ = idx.search_filtered(q, "hot", k=10, l_search=48,
                                     method="multihop")
    ret = ids[ids >= 0]
    assert len(ret) > 0
    assert hot[ret].all()
    hot_ids = np.nonzero(hot)[0]
    flat = FlatIndex(x[hot_ids], Metric.L2)
    _, gi = flat.search(q, k=10)
    gt = hot_ids[gi]
    assert knn_recall(ids, gt, 10) >= 0.8


def test_labelset_many_labels_yfcc_scale(rng):
    """YFCC metadata carries hundreds of distinct labels — the bitset must
    grow past its initial 128-bit word budget and stay queryable."""
    from diskann_tpu.filters import LabelSet

    n, n_labels = 600, 500
    labels_per_point = [
        [f"tag{t}" for t in rng.choice(n_labels, size=3, replace=False)]
        for _ in range(n)
    ]
    ls = LabelSet.from_lists(labels_per_point, capacity=1024)
    assert len(ls.vocab) == len({l for ll in labels_per_point for l in ll})
    assert ls.bits.shape[1] >= -(-len(ls.vocab) // 32)
    # spot-check membership both ways
    for pid in (0, 17, 599):
        for l in labels_per_point[pid]:
            assert pid in ls.members(l)
            assert bool(np.asarray(ls.test(l, jnp.asarray([pid]))).item())

    # incremental set_labels with NEW labels triggers mid-call word growth
    ls.set_labels(
        np.array([600, 601]),
        [[f"new{t}" for t in range(40)], ["tag0", "new0"]],
    )
    assert 600 in ls.members("new39")
    assert 601 in ls.members("new0")
    for l in labels_per_point[17]:
        assert 17 in ls.members(l)  # old rows survive the growth


def test_inline_filter_matches_scalar_oracle(rng):
    """Exact parity of the inline beta-filter search against the scalar
    oracle (`reference_impl.greedy_filter_search`): matched ids, nav-list
    ids, and cmps counts, at beam_width=1 with an exact visited ring."""
    from diskann_tpu.graph.scorers import full_precision_scorer
    from diskann_tpu.graph.search import beam_search_scored
    from reference_impl import greedy_filter_search

    n, d, r, l = 200, 8, 6, 12
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    adj = np.full((n, r), -1, np.int32)
    for i in range(n):
        ch = rng.choice(n - 1, size=r, replace=False)
        ch[ch >= i] += 1
        adj[i] = ch
    hot = rng.random(n) < 0.3
    hot[0] = True  # start point accepted in at least one case
    ls = LabelSet.from_lists(
        [["hot"] if h else ["cold"] for h in hot], capacity=n
    )
    accept_fn = compile_accept(parse_predicate("hot"), ls.vocab, n)
    queries = rng.standard_normal((4, d)).astype(np.float32)
    sdef, sdata = full_precision_scorer(
        jnp.asarray(vectors),
        jnp.asarray((vectors * vectors).sum(1)),
        Metric.L2,
    )
    res = beam_search_scored(
        sdef, sdata, jnp.asarray(adj), jnp.zeros((1,), jnp.int32),
        jnp.asarray(queries),
        l_search=l, beam_width=1, max_hops=4096,
        history_capacity=16384,
        accept_fn=accept_fn, accept_data=ls.bits,
        filter_beta=0.5, filter_mode="inline",
    )
    for b in range(len(queries)):
        want_m, want_nav, want_cmps = greedy_filter_search(
            vectors, adj, [0], queries[b], l, lambda i: hot[i], beta=0.5
        )
        got_m = [int(i) for i in res.match_i[b] if i >= 0]
        got_nav = [int(i) for i in res.ids[b] if i >= 0]
        assert got_m == want_m, (b, got_m, want_m)
        assert got_nav == want_nav, (b, got_nav, want_nav)
        assert int(res.cmps[b]) == want_cmps, (b, int(res.cmps[b]), want_cmps)


def test_adaptive_l_filtered_resume(rng):
    """The adaptive-L second pass RESUMES the pass-1 scratch (grown window +
    frontier re-seeded from the scored-id ring) instead of re-searching:
    found counts strictly improve, cmps/hops accumulate across the resume,
    and all results still honor the predicate."""
    n, d = 3000, 16
    centers = rng.standard_normal((24, d)).astype(np.float32) * 2
    a = rng.integers(0, 24, size=n)
    x = centers[a] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    idx = GraphIndex.build(x, GraphConfig(max_degree=16, l_build=32),
                           insert_batch_size=1024)
    hot = np.random.default_rng(1).random(n) < 0.04
    idx.attach_labels([["hot"] if h else ["cold"] for h in hot])
    q = x[rng.choice(n, size=12, replace=False)] + 0.01
    # scan_threshold=0 forces graph navigation (no posting-list escape hatch)
    kw = dict(k=10, l_search=12, method="inline", scan_threshold=0)
    _, fi0, s0 = idx.search_filtered(q, "hot", adaptive_l=False, **kw)
    _, fi1, s1 = idx.search_filtered(q, "hot", adaptive_l=True, **kw)
    f0 = (fi0 >= 0).sum(axis=1)
    f1 = (fi1 >= 0).sum(axis=1)
    assert (f0 < 10).any(), "fixture no longer triggers the adaptive pass"
    assert (f1 >= f0).all(), (f1, f0)
    assert f1.sum() > f0.sum() + len(q), (f1, f0)  # real recovery, not noise
    ret = fi1[fi1 >= 0]
    assert hot[ret].all()
    # regression: ring reseed must not re-append matched ids (dup results)
    for b in range(len(q)):
        live = fi1[b][fi1[b] >= 0]
        assert len(live) == len(set(live.tolist())), (b, live)
    # cmps/hops accumulate across the resume: strictly more work than pass 1
    # alone, far less than pass1 + an equivalent from-scratch re-search
    assert np.asarray(s1.cmps).sum() > np.asarray(s0.cmps).sum()
    assert np.asarray(s1.hops).sum() > np.asarray(s0.hops).sum()


def test_filtered_search_selective_predicate_adaptive_l(rng):
    """Adaptive-L at ~1% selectivity (weak spot flagged in round 1): the
    re-search at scaled L must recover matches the first pass misses."""
    from diskann_tpu import GraphConfig, GraphIndex

    n, d = 4000, 16
    centers = rng.standard_normal((32, d)).astype(np.float32) * 2
    a = rng.integers(0, 32, size=n)
    x = centers[a] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    idx = GraphIndex.build(x, GraphConfig(max_degree=16, l_build=32),
                           insert_batch_size=1024)
    rare = np.zeros(n, bool)
    rare[rng.choice(n, size=n // 100, replace=False)] = True  # 1%
    idx.attach_labels(
        [["rare" if rare[i] else "common", f"g{i % 4}"] for i in range(n)]
    )
    q = x[rng.choice(n, size=16, replace=False)] + 0.02
    fd, fi, stats = idx.search_filtered(q, "rare", k=5, l_search=32,
                                        adaptive_l=True)
    # the selective predicate takes the exact posting-list path: all 5
    # found for every query, zero graph hops
    found = (fi >= 0).sum(axis=1)
    assert (found == 5).all(), found
    assert (stats.hops == 0).all()
    # the non-selective label still navigates the graph
    _, ci, cstats = idx.search_filtered(q, "common", k=5, l_search=32)
    assert (ci >= 0).all() and (cstats.hops > 0).all()
    # returned ids really match the predicate
    ok = fi[fi >= 0]
    assert rare[ok].all()


def test_filtered_search_packed_production_path(rng):
    """mode='packed': router + packed int8 traversal + inline filter +
    full-precision rerank of the matched list, one composed dispatch per
    sub-batch — results must honor the predicate and match the filtered
    exact scan (the production filtered path; inline_filter_search.rs
    composed like the quant search)."""
    n, d = 1500, 16
    centers = rng.standard_normal((20, d)).astype(np.float32)
    a = rng.integers(0, 20, size=n)
    x = centers[a] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 20, size=24)] + 0.15 * rng.standard_normal(
        (24, d)
    ).astype(np.float32)
    idx = GraphIndex.build(
        x, GraphConfig(max_degree=16, l_build=32), insert_batch_size=512,
        build_mode="packed", packed_dp=16,
    )
    red = rng.random(n) < 0.4
    idx.attach_labels([["red"] if r else ["blue"] for r in red])

    fd, fi, stats = idx.search_filtered(
        q, "red", k=10, l_search=48, mode="packed", scan_threshold=0,
    )
    got = fi[fi >= 0]
    assert got.size > 0 and red[got].all()
    red_ids = np.nonzero(red)[0]
    gt_d = ((q[:, None, :] - x[None, red, :]) ** 2).sum(-1)
    gt = red_ids[np.argsort(gt_d, axis=1)[:, :10]]
    r = knn_recall(fi, gt, 10)
    assert r >= 0.85, r
    # rerank distances are FULL precision (match exact recompute)
    exact = ((q[:, None, :] - x[np.clip(fi, 0, n - 1)]) ** 2).sum(-1)
    ok = fi >= 0
    np.testing.assert_allclose(fd[ok], exact[ok], rtol=1e-3, atol=1e-3)
    # adaptive fallback triggers for a rare predicate and still honors it
    rare = rng.random(n) < 0.01
    lab = [
        (["red"] if r else ["blue"]) + (["rare"] if s else [])
        for r, s in zip(red, rare)
    ]
    idx.attach_labels(lab)
    fd2, fi2, _ = idx.search_filtered(
        q, "rare", k=5, l_search=32, mode="packed", scan_threshold=0,
    )
    got2 = fi2[fi2 >= 0]
    assert got2.size > 0 and rare[got2].all()


def test_adaptive_l_compact_retry(rng, monkeypatch):
    """The packed filtered path's AdaptiveL second pass dispatches ONLY the
    short queries, compacted into a 64-padded sub-batch (VERDICT r4 item 6;
    reference AdaptiveL re-searches only the unsatisfied query,
    `inline_filter_search.rs:63-75`) — and the compacted results scatter
    back to the right rows."""
    n, d = 1500, 16
    centers = rng.standard_normal((20, d)).astype(np.float32)
    a = rng.integers(0, 20, size=n)
    x = centers[a] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 20, size=80)] + 0.15 * rng.standard_normal(
        (80, d)
    ).astype(np.float32)
    idx = GraphIndex.build(
        x, GraphConfig(max_degree=16, l_build=32), insert_batch_size=512,
        build_mode="packed", packed_dp=16,
    )
    rare = rng.random(n) < 0.015
    rare[:3] = True  # never empty
    idx.attach_labels([["rare"] if r else ["blue"] for r in rare])

    kw = dict(k=5, l_search=32, mode="packed", scan_threshold=0)
    fd0, fi0, _ = idx.search_filtered(q, "rare", adaptive_l=False, **kw)
    short = (fi0 >= 0).sum(axis=1) < 5
    s = int(short.sum())
    assert 0 < s, "test shape no longer produces short queries"

    calls = []
    orig = GraphIndex._composed_filtered_fn

    def spy(self, accept_fn, k, l_cur, *args, **kwargs):
        fn = orig(self, accept_fn, k, l_cur, *args, **kwargs)

        def wrapped(q_wire, *rest):
            calls.append((l_cur, int(q_wire.shape[0])))
            return fn(q_wire, *rest)

        return wrapped

    monkeypatch.setattr(GraphIndex, "_composed_filtered_fn", spy)
    fd, fi, _ = idx.search_filtered(q, "rare", adaptive_l=True, **kw)
    ls = sorted({l for l, _ in calls})
    assert len(ls) == 2, calls  # one widened retry happened
    pass1_rows = sum(r for l, r in calls if l == ls[0])
    pass2_rows = sum(r for l, r in calls if l == ls[1])
    assert pass1_rows == -(-80 // 64) * 64
    assert pass2_rows == -(-s // 64) * 64, (s, calls)  # ∝ short count
    # satisfied pass-1 rows untouched; retried rows still honor the filter
    np.testing.assert_array_equal(fi[~short], fi0[~short])
    got = fi[fi >= 0]
    assert got.size > 0 and rare[got].all()
