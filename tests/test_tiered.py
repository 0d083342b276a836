"""Tiered index: packed-code traversal in 'HBM' + host-RAM rerank."""

import numpy as np
import pytest

from diskann_tpu import FlatIndex, GraphConfig, Metric
from diskann_tpu.bench.recall import knn_recall
from diskann_tpu.tiered import HostVectorStore, TieredIndex


def test_tiered_search_recall(rng):
    n, d = 1500, 32
    centers = rng.standard_normal((25, d)).astype(np.float32) * 2
    a = rng.integers(0, 25, size=n)
    x = centers[a] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 25, size=40)] + 0.2 * rng.standard_normal(
        (40, d)
    ).astype(np.float32)

    t = TieredIndex.build_from_host(
        x, GraphConfig(max_degree=16, l_build=32), dp=16,
        insert_batch_size=512,
    )
    # the HBM full-precision copy is gone
    assert t.graph.state.vectors.shape[0] == 1

    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    d, ids, res = t.search(q, k=10, l_search=40)
    assert knn_recall(ids, gt_i, 10) >= 0.9
    assert t.io_stats["rows_staged"] == 40 * 40  # B * L staged


def test_tiered_io_limit(rng):
    n, d = 600, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    t = TieredIndex.build_from_host(
        x, GraphConfig(max_degree=12, l_build=24), dp=16,
        insert_batch_size=256,
    )
    t.io_limit = 12
    _, ids, _ = t.search(x[:8] + 0.01, k=5, l_search=24)
    assert t.io_stats["rows_staged"] == 8 * 12  # budget respected
    assert (ids[:, 0] >= 0).all()


def test_tiered_filtered_search(rng):
    """RerankAndFilter over the tiers (`disk_provider.rs:292`): packed
    traversal collects accepted matches at quantized distances, host rows
    stage for an exact rerank; results honor the predicate and beat the
    quantized ordering."""
    from diskann_tpu import GraphConfig
    from diskann_tpu.tiered import TieredIndex

    n, d = 2000, 24
    centers = rng.standard_normal((16, d)).astype(np.float32)
    a = rng.integers(0, 16, size=n)
    x = centers[a] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
    t = TieredIndex.build_from_host(
        x, GraphConfig(max_degree=16, l_build=32), dp=16,
        insert_batch_size=512,
    )
    hot = rng.random(n) < 0.3
    t.graph.attach_labels([["hot"] if h else ["cold"] for h in hot])
    q = centers[rng.integers(0, 16, size=16)] + 0.15 * rng.standard_normal(
        (16, d)
    ).astype(np.float32)
    fd, fi, res = t.search_filtered(q, "hot", k=10, l_search=48)
    got = fi[fi >= 0]
    assert got.size > 0 and hot[got].all()
    # regression: accepted nodes re-scored after falling off the nav list
    # must not duplicate in the match list / reranked results
    for b in range(len(q)):
        live = fi[b][fi[b] >= 0]
        assert len(live) == len(set(live.tolist())), (b, live)
    # recall vs exact filtered scan
    hot_ids = np.nonzero(hot)[0]
    gt_d = ((q[:, None, :] - x[None, hot, :]) ** 2).sum(-1)
    gt = hot_ids[np.argsort(gt_d, axis=1)[:, :10]]
    from diskann_tpu.bench.recall import knn_recall

    r = knn_recall(fi, gt, 10)
    assert r >= 0.8, r
    # reranked distances are exact (match the raw vectors)
    for b in range(4):
        for j in range(3):
            if fi[b, j] >= 0:
                true = ((q[b] - x[fi[b, j]]) ** 2).sum()
                np.testing.assert_allclose(fd[b, j], true, rtol=1e-4)


def test_host_store_fbin(tmp_path, rng):
    from diskann_tpu.io_.fbin import write_fbin

    x = rng.standard_normal((50, 8)).astype(np.float32)
    p = str(tmp_path / "v.fbin")
    write_fbin(p, x)
    store = HostVectorStore.from_fbin(p)
    got = store.fetch(np.array([3, 7, 49]))
    np.testing.assert_allclose(got, x[[3, 7, 49]])


def test_native_hostio(tmp_path, rng):
    from diskann_tpu.io_.fbin import write_fbin
    from diskann_tpu.native import NativeVectorFile, get_lib

    if get_lib() is None:
        pytest.skip("no native toolchain")
    x = rng.standard_normal((200, 16)).astype(np.float32)
    p = str(tmp_path / "v.fbin")
    write_fbin(p, x)
    nf = NativeVectorFile(p, 4, cache_rows=64)
    ids = rng.integers(0, 200, size=500)
    got = nf.gather(ids)
    np.testing.assert_allclose(got, x[ids])
    stats = nf.cache_stats
    assert stats["hits"] + stats["misses"] == 500
    assert stats["hits"] > 0  # 500 draws over 200 rows must hit
    nf.close()


def test_native_hostio_uring(tmp_path, rng):
    """io_uring batched-read path (reference `platform/linux.rs` analogue):
    same gather semantics as the mmap path, including id clamping.  Skips
    where the kernel/seccomp disables the io_uring syscalls."""
    from diskann_tpu.io_.fbin import write_fbin
    from diskann_tpu.native import NativeVectorFile, get_lib

    if get_lib() is None:
        pytest.skip("no native toolchain")
    x = rng.standard_normal((300, 24)).astype(np.float32)
    p = str(tmp_path / "v.fbin")
    write_fbin(p, x)
    nf = NativeVectorFile(p, 4, uring=True, uring_depth=64)
    if not nf.uring_active:
        nf.close()
        pytest.skip("io_uring unavailable in this sandbox")
    ids = rng.integers(0, 300, size=1000)
    got = nf.gather(ids)
    np.testing.assert_allclose(got, x[ids])
    # clamping matches the mmap path
    got2 = nf.gather(np.array([-5, 0, 299, 10_000]))
    np.testing.assert_allclose(got2, x[[0, 0, 299, 299]])
    # more rows than ring depth in one call (multi-wave submit)
    big = rng.integers(0, 300, size=5000)
    np.testing.assert_allclose(nf.gather(big), x[big])
    nf.close()


def test_tiered_uses_native_when_file_backed(tmp_path, rng):
    from diskann_tpu.io_.fbin import write_fbin

    x = rng.standard_normal((100, 8)).astype(np.float32)
    p = str(tmp_path / "v.fbin")
    write_fbin(p, x)
    store = HostVectorStore.from_fbin(p, cache_rows=32)
    got = store.fetch(np.array([[1, 2], [3, 99]]))
    assert got.shape == (2, 2, 8)
    np.testing.assert_allclose(got[1, 1], x[99])


def test_tiered_batched_pipeline_matches(tmp_path, rng):
    # search_batched (async native staging pipeline) must match search()
    n, d = 1200, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    from diskann_tpu.io_.fbin import write_fbin
    from diskann_tpu.tiered.index import HostVectorStore, TieredIndex

    path = str(tmp_path / "vecs.fbin")
    write_fbin(path, x)

    from diskann_tpu import GraphIndex

    cfg = GraphConfig(max_degree=16, l_build=32)
    g = GraphIndex.build(x, cfg, insert_batch_size=512)
    g.attach_packed(dp=16)
    store = HostVectorStore.from_fbin(path, cache_rows=256)
    ti = TieredIndex(g, store)

    q = rng.standard_normal((100, d)).astype(np.float32)
    d1, i1, _ = ti.search(q, k=10, l_search=32)
    d2, i2, _ = ti.search_batched(q, k=10, l_search=32, batch_size=32)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5)


# ---------------------------------------------------------------- merged build
def test_merged_build_over_budget(rng):
    """HBM-budget sharded build (`MergedVamanaIndexBuilder`, core.rs:34-76):
    k-means shards with overlap-2 assignment, per-shard device builds, id-
    union merge ranked by exact edge length, packed codes chunk-encoded."""
    from diskann_tpu.tiered.merged_build import build_merged

    n, d = 4000, 32
    centers = rng.standard_normal((30, d)).astype(np.float32) * 2
    a = rng.integers(0, 30, size=n)
    x = centers[a] + 0.25 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 30, size=50)] + 0.25 * rng.standard_normal(
        (50, d)
    ).astype(np.float32)

    t = build_merged(
        x, GraphConfig(max_degree=16, l_build=32), n_shards=3, dp=16,
        insert_batch_size=512, seed=3,
    )
    g = t.graph
    # vectors never became device-resident in the merged graph
    assert g.state.vectors.shape[0] == 1
    assert g.n == n
    adj = np.asarray(g.state.adjacency[:n])
    # merge invariants: no self loops, no dups, degrees match rows
    assert not (adj == np.arange(n)[:, None]).any()
    srt = np.sort(np.where(adj < 0, 2**31 - 1, adj), axis=1)
    dup = (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] < 2**31 - 1)
    assert not dup.any()
    np.testing.assert_array_equal(
        np.asarray(g.state.degrees[:n]), (adj >= 0).sum(axis=1)
    )
    assert (adj >= 0).sum(axis=1).min() >= 1  # nobody orphaned

    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    _, ids, _ = t.search(q, k=10, l_search=48)
    assert knn_recall(ids, gt_i, 10) >= 0.88


def test_merged_build_overlap3(rng):
    """overlap=3 (partition.rs:23 allows any overlap): each extra shard a
    row belongs to folds into its running (ids, lengths) via one more
    pairwise merge.  Invariants hold and recall is >= the overlap-2 build
    on the same data."""
    from diskann_tpu.tiered.merged_build import build_merged

    n, d = 3000, 24
    centers = rng.standard_normal((24, d)).astype(np.float32) * 2
    a = rng.integers(0, 24, size=n)
    x = centers[a] + 0.25 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 24, size=40)] + 0.25 * rng.standard_normal(
        (40, d)
    ).astype(np.float32)
    gt_i = FlatIndex(x, Metric.L2).search(q, k=10)[1]

    recalls = {}
    for ov in (2, 3):
        t = build_merged(
            x, GraphConfig(max_degree=16, l_build=32), n_shards=4, dp=16,
            insert_batch_size=512, seed=3, overlap=ov,
        )
        adj = np.asarray(t.graph.state.adjacency[:n])
        assert not (adj == np.arange(n)[:, None]).any()
        srt = np.sort(np.where(adj < 0, 2**31 - 1, adj), axis=1)
        dup = (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] < 2**31 - 1)
        assert not dup.any()
        np.testing.assert_array_equal(
            np.asarray(t.graph.state.degrees[:n]), (adj >= 0).sum(axis=1)
        )
        _, ids, _ = t.search(q, k=10, l_search=48)
        recalls[ov] = knn_recall(ids, gt_i, 10)
    # more overlap = more merge passes = a denser, no-worse graph
    assert recalls[3] >= recalls[2] - 0.02, recalls


def test_merged_build_adj_width_and_checkpoint(rng, tmp_path):
    """adj_width truncates the read-only merged adjacency to its best
    (rank-ordered) columns — the >HBM tier's 50M memory lever; and
    checkpoint_dir makes the sharded build resumable: a second run with
    the same arguments skips completed shards and reproduces the SAME
    adjacency (the k-means partition is seed-deterministic)."""
    from diskann_tpu.tiered.merged_build import build_merged

    n, d = 2500, 24
    centers = rng.standard_normal((20, d)).astype(np.float32) * 2
    a = rng.integers(0, 20, size=n)
    x = centers[a] + 0.25 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 20, size=30)] + 0.25 * rng.standard_normal(
        (30, d)
    ).astype(np.float32)
    ck = str(tmp_path / "ckpt")
    kw = dict(n_shards=3, dp=16, insert_batch_size=512, seed=3,
              adj_width=12, checkpoint_dir=ck)
    t = build_merged(x, GraphConfig(max_degree=12, l_build=24), **kw)
    adj1 = np.asarray(t.graph.state.adjacency[:n])
    assert adj1.shape[1] == 12          # truncated to adj_width
    degs = np.asarray(t.graph.state.degrees[:n])
    np.testing.assert_array_equal(degs, (adj1 >= 0).sum(axis=1))
    gt_i = FlatIndex(x, Metric.L2).search(q, k=10)[1]
    _, ids, _ = t.search(q, k=10, l_search=40)
    assert knn_recall(ids, gt_i, 10) >= 0.85
    # resume: all shards recorded done -> rebuild skips every device build
    # and assembles the identical adjacency from the memmapped merge state
    done = (tmp_path / "ckpt" / "shards_done.txt").read_text().split()
    assert len(done) == 3
    t2 = build_merged(x, GraphConfig(max_degree=12, l_build=24), **kw)
    np.testing.assert_array_equal(
        adj1, np.asarray(t2.graph.state.adjacency[:n])
    )


def test_merged_build_sq_codes_router(rng, tmp_path):
    """codes="sq" merged build (full-dim int8 traversal — the 20M-tier
    representation) + router entry points + the ONE-dispatch composed
    search_batched path, incl. the f16 row wire; sq variant save/load
    round-trips with identical results (the 20M run reuses its saved
    index across sweeps)."""
    from diskann_tpu.tiered.merged_build import build_merged

    n, d = 4000, 32
    centers = rng.standard_normal((30, d)).astype(np.float32) * 2
    a = rng.integers(0, 30, size=n)
    x = centers[a] + 0.25 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 30, size=50)] + 0.25 * rng.standard_normal(
        (50, d)
    ).astype(np.float32)

    t = build_merged(
        x, GraphConfig(max_degree=16, l_build=32), n_shards=3,
        insert_batch_size=512, seed=3, codes="sq",
    )
    g = t.graph
    assert getattr(g, "sq", None) is not None
    assert g.sq_codes.shape == (g.state.capacity, d)
    assert str(g.sq_codes.dtype) == "int8"

    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    # medoid start (no router)
    _, ids0, _ = t.search_batched(q, k=10, l_search=48, batch_size=16)
    assert knn_recall(ids0, gt_i, 10) >= 0.88
    # router starts + f16 wire: recall must not degrade
    t.attach_router(size=256)
    _, ids1, _ = t.search_batched(
        q, k=10, l_search=48, batch_size=16, router_starts=4,
        row_wire=np.float16,
    )
    assert knn_recall(ids1, gt_i, 10) >= knn_recall(ids0, gt_i, 10) - 0.02
    # sq save/load round-trip: identical results after reload
    p = str(tmp_path / "sqidx")
    t.save(p)
    t_re = TieredIndex.load(p)
    _, ids_a, _ = t.search(q[:8], k=10, l_search=48)
    _, ids_b, _ = t_re.search(q[:8], k=10, l_search=48)
    np.testing.assert_array_equal(ids_a, ids_b)
    # 4-bit PQ (fused masked ADC) build + reconstructed-row router table
    # (16 chunks = 2 dims/chunk at 16 centers — the 64-chunks-at-d=128
    # ratio the 20M tier uses)
    t2 = build_merged(
        x, GraphConfig(max_degree=16, l_build=32), n_shards=3,
        insert_batch_size=512, seed=3, codes="pq", pq_chunks=16,
        pq_centers=16,
    )
    t2.attach_router(size=256)
    _, ids2, _ = t2.search_batched(
        q, k=10, l_search=48, batch_size=16, router_starts=4,
    )
    # the PQ tier's recall is bounded by the quantizer, not the graph:
    # ceiling = exact rerank of the top-48 by TRUE PQ (ADC) distance —
    # what a brute-force scan of the codes would stage.  The graph walk
    # must land within 10% of that ceiling.
    g2 = t2.graph
    dec = np.asarray(g2.pq.decode(g2.pq_codes[:n])[:, :d])
    adc = ((q[:, None, :] - dec[None, :, :]) ** 2).sum(-1)   # [50, n]
    cand = np.argsort(adc, axis=1)[:, :48]
    ex = ((q[:, None, :] - x[cand]) ** 2).sum(-1)
    ceil_ids = np.take_along_axis(cand, np.argsort(ex, axis=1)[:, :10], 1)
    ceiling = knn_recall(ceil_ids, gt_i, 10)
    assert knn_recall(ids2, gt_i, 10) >= ceiling - 0.10


def test_merged_build_single_shard_delegates(rng):
    from diskann_tpu.tiered.merged_build import build_merged

    x = rng.standard_normal((600, 16)).astype(np.float32)
    t = build_merged(
        x, GraphConfig(max_degree=12, l_build=24), n_shards=1, dp=16,
        insert_batch_size=256,
    )
    _, ids, _ = t.search(x[:5] + 0.01, k=1, l_search=24)
    assert (ids[:, 0] == np.arange(5)).mean() >= 0.8


def test_merged_build_save_load(tmp_path, rng):
    from diskann_tpu.tiered.merged_build import build_merged

    n, d = 1500, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    t = build_merged(
        x, GraphConfig(max_degree=12, l_build=24), n_shards=3, dp=16,
        insert_batch_size=256, seed=5,
    )
    q = x[:16] + 0.01
    _, ids0, _ = t.search(q, k=5, l_search=24)
    p = str(tmp_path / "merged")
    t.save(p)
    t2 = TieredIndex.load(p)
    _, ids1, _ = t2.search(q, k=5, l_search=24)
    np.testing.assert_array_equal(ids0, ids1)


def test_plan_shards_budget():
    from diskann_tpu.tiered.merged_build import plan_shards

    # a dataset needing ~4x the budget with overlap 2 -> >= 8 shards
    one = plan_shards(1 << 20, 128, 83, dp=64, overlap=2,
                      hbm_budget_bytes=1 << 40)
    assert one == 1
    many = plan_shards(1 << 20, 128, 83, dp=64, overlap=2,
                       hbm_budget_bytes=200 * (1 << 20))
    assert many >= 8


def test_tiered_range_search(rng):
    """Range search over the tiers: two-round L doubling with exact
    reranked distances, so radius membership matches the flat scan."""
    from diskann_tpu import GraphConfig
    from diskann_tpu.tiered import TieredIndex

    n, d = 1500, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    t = TieredIndex.build_from_host(
        x, GraphConfig(max_degree=16, l_build=32), dp=16,
        insert_batch_size=512,
    )
    q = x[rng.choice(n, size=6, replace=False)] + 0.01
    dall = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    radius = float(np.quantile(dall, 0.005))
    got = t.search_range(q, radius, l_init=32)
    for b in range(len(q)):
        want = set(np.nonzero(dall[b] <= radius)[0].tolist())
        have = set(int(i) for i in got[b])
        # graph recall within the radius; no false positives ever
        assert have <= want, have - want
        assert len(have) >= 0.85 * len(want), (len(have), len(want))


def test_merged_build_pq_codes(rng):
    """codes='pq': the 100M-class HBM tier — PQ ADC codes + adjacency only
    (no fat-row table), traversal mode='pq' with host-staged exact rerank
    (`disk_provider.rs:634-654` PQ-in-RAM + rerank shape)."""
    from diskann_tpu.tiered.merged_build import build_merged

    n, d = 4000, 32
    centers = rng.standard_normal((30, d)).astype(np.float32) * 2
    a = rng.integers(0, 30, size=n)
    x = centers[a] + 0.25 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 30, size=50)] + 0.25 * rng.standard_normal(
        (50, d)
    ).astype(np.float32)

    t = build_merged(
        x, GraphConfig(max_degree=16, l_build=32), n_shards=3,
        insert_batch_size=512, seed=3, codes="pq", pq_chunks=8,
    )
    g = t.graph
    assert g.packed is None                 # no fat-row table at this scale
    assert g.pq_codes.shape == (g.state.capacity, 8)
    assert g.state.vectors.shape[0] == 1    # vectors host-side only
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    _, ids, _ = t.search(q, k=10, l_search=48, mode="pq")
    assert knn_recall(ids, gt_i, 10) >= 0.85
    # pipelined batched path agrees
    _, ids2, _ = t.search_batched(q, k=10, l_search=48, batch_size=32,
                                  mode="pq")
    assert knn_recall(ids2, gt_i, 10) >= 0.85


def test_sqlite_vector_store_plugs_in(tmp_path, rng):
    """Second real external store through the provider boundary (the
    diskann-bftree exemplar role, `diskann-bftree/src/lib.rs:6-35`): a
    SQLite B-tree serves the full-precision rerank tier with identical
    results to the in-RAM store, including the async staging pipeline."""
    from diskann_tpu import GraphConfig, GraphIndex
    from diskann_tpu.tiered import TieredIndex
    from diskann_tpu.tiered.stores import SqliteVectorStore

    n, d = 1000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    g = GraphIndex.build(x, GraphConfig(max_degree=12, l_build=24),
                         insert_batch_size=512)
    g.attach_packed(dp=16)
    store = SqliteVectorStore.from_array(str(tmp_path / "v.db"), x)
    assert store.n == n and store.dim == d
    np.testing.assert_allclose(store.fetch(np.array([3, 9, 999])),
                               x[[3, 9, 999]])
    ti = TieredIndex(g, store)
    ti_ram = TieredIndex(g, HostVectorStore(x))
    q = rng.standard_normal((24, d)).astype(np.float32)
    d1, i1, _ = ti.search(q, k=5, l_search=24)
    d2, i2, _ = ti_ram.search(q, k=5, l_search=24)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5)
    # pipelined path drives fetch_async/fetch_wait
    d3, i3, _ = ti.search_batched(q, k=5, l_search=24, batch_size=8)
    np.testing.assert_array_equal(i3, i2)
    # streaming writes: replace a row, the rerank sees the new bytes
    store.put(np.array([0]), np.ones((1, d), np.float32) * 9.0)
    got = store.fetch(np.array([0]))
    np.testing.assert_allclose(got[0], 9.0)
