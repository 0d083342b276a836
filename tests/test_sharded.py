"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from diskann_tpu import FlatIndex, GraphConfig, Metric
from diskann_tpu.bench.recall import knn_recall
from diskann_tpu.parallel import ShardedGraphIndex, sharded_flat_search


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices())
    return Mesh(devs, axis_names=("shard",))


def test_sharded_flat_matches_single(rng, mesh):
    x = rng.standard_normal((1000, 16)).astype(np.float32)
    q = rng.standard_normal((16, 16)).astype(np.float32)
    d, i = sharded_flat_search(mesh, jnp.asarray(x), jnp.asarray(q), k=10)
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    assert knn_recall(np.asarray(i), gt_i, 10) >= 0.99
    np.testing.assert_allclose(np.asarray(d), gt_d, rtol=1e-3, atol=1e-3)


def test_sharded_graph_build_and_search(rng, mesh):
    n, d = 1600, 16
    centers = rng.standard_normal((30, d)).astype(np.float32)
    a = rng.integers(0, 30, size=n)
    x = centers[a] + 0.1 * rng.standard_normal((n, d)).astype(np.float32)
    qa = rng.integers(0, 30, size=50)
    q = centers[qa] + 0.1 * rng.standard_normal((50, d)).astype(np.float32)

    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = ShardedGraphIndex(mesh, d, cfg, cap_per_shard=512)
    assign = np.arange(n) % idx.n_shards
    for off in range(0, n, 800):
        idx.insert(x[off : off + 800], assign[off : off + 800])

    dists, gids, cmps = idx.search(q, k=10, l_search=40)
    # search returns EXTERNAL ids == insertion order == original row index
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    r = knn_recall(gids, gt_i, 10)
    assert r >= 0.9, r


def test_sharded_filtered_search(rng, mesh):
    """Label-filtered search over the sharded index: per-shard inline beta
    filter, matched lists merged across the mesh with external-id dedup.
    All returned ids honor the predicate; recall vs the filtered flat scan
    holds; overlap-duplicated ids never repeat in a result row."""
    n, d = 1600, 16
    centers = rng.standard_normal((24, d)).astype(np.float32)
    a = rng.integers(0, 24, size=n)
    x = centers[a] + 0.1 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 24, size=32)] + 0.1 * rng.standard_normal(
        (32, d)
    ).astype(np.float32)

    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = ShardedGraphIndex(mesh, d, cfg, cap_per_shard=512)
    # overlap-2 routing so some external ids live in two shards
    assign = np.stack(
        [np.arange(n) % idx.n_shards, (np.arange(n) + 1) % idx.n_shards],
        axis=1,
    )
    idx.insert(x, assign)
    red = rng.random(n) < 0.35
    idx.attach_labels([["red"] if r else ["blue"] for r in red])

    fd, fi, cmps = idx.search_filtered(q, "red", k=10, l_search=48)
    found = fi[fi >= 0]
    assert found.size > 0 and red[found].all()
    for b in range(len(q)):
        live = fi[b][fi[b] >= 0]
        assert len(live) == len(set(live.tolist())), live  # dedup held
    # recall vs exact filtered scan
    gt_d = ((q[:, None, :] - x[None, red, :]) ** 2).sum(-1)
    red_ids = np.nonzero(red)[0]
    gt = red_ids[np.argsort(gt_d, axis=1)[:, :10]]
    r = knn_recall(fi, gt, 10)
    assert r >= 0.85, r
    # negated predicate routes to the complement
    _, bi, _ = idx.search_filtered(q, "!red", k=5, l_search=48)
    bl = bi[bi >= 0]
    assert bl.size > 0 and (~red[bl]).all()
    # regression: inserts after attach_labels (incl. capacity growth) must
    # not surface unlabeled points as matches (stale bits once clamped
    # out-of-range gathers onto arbitrary rows)
    extra = centers[rng.integers(0, 24, size=600)] + 0.1 * (
        rng.standard_normal((600, d)).astype(np.float32)
    )
    idx.insert(extra)  # forces grow past cap_per_shard=512
    _, fi2, _ = idx.search_filtered(q, "red", k=10, l_search=48)
    got2 = fi2[fi2 >= 0]
    assert got2.size > 0 and (got2 < n).all(), got2[got2 >= n]
    assert red[got2].all()


def test_kmeans_partition_overlap(rng, mesh):
    from diskann_tpu.parallel.partition import (
        estimate_build_ram_bytes, kmeans_partition, shard_lists,
    )

    centers = rng.standard_normal((8, 8)).astype(np.float32) * 5
    a = rng.integers(0, 8, size=400)
    x = centers[a] + 0.1 * rng.standard_normal((400, 8)).astype(np.float32)
    c, assign = kmeans_partition(x, 4, overlap=2)
    assert assign.shape == (400, 2)
    # overlap shards are distinct
    assert (assign[:, 0] != assign[:, 1]).all()
    lists = shard_lists(assign, 4)
    # with overlap=2 total assignments = 2N
    assert sum(len(l) for l in lists) == 800
    # every shard gets a reasonable share
    assert min(len(l) for l in lists) > 20
    assert estimate_build_ram_bytes(1_000_000, 128, 83) > 0


def test_sharded_build_with_kmeans_partition(rng, mesh):
    from diskann_tpu.parallel.partition import kmeans_partition
    from diskann_tpu.bench.recall import knn_recall as kr
    from diskann_tpu import FlatIndex, Metric as M

    n, d = 1600, 16
    centers = rng.standard_normal((16, d)).astype(np.float32) * 3
    a = rng.integers(0, 16, size=n)
    x = centers[a] + 0.1 * rng.standard_normal((n, d)).astype(np.float32)
    _, assign = kmeans_partition(x, 8, overlap=1)

    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = ShardedGraphIndex(mesh, d, cfg, cap_per_shard=512)
    idx.insert(x, assign[:, 0])
    q = centers[rng.integers(0, 16, size=40)] + 0.1 * rng.standard_normal(
        (40, d)
    ).astype(np.float32)
    dists, gids, _ = idx.search(q, k=10, l_search=40)
    # locality partitioning keeps recall: compare distances to exact
    gt_d, _ = FlatIndex(x, M.L2).search(q, k=10)
    close = np.abs(np.asarray(dists) - gt_d) <= 1e-3 + 1e-3 * np.abs(gt_d)
    # hard (overlap=1) partitioning loses some cross-shard neighbors at the
    # tail of the top-10; ~3/4 exact matches is the expected operating point
    assert close.mean() >= 0.7


def test_sharded_packed_search(rng, mesh):
    # packed (int8 fat-row) traversal per shard must reach the recall of
    # the full-precision sharded search
    n, d = 1600, 16
    centers = rng.standard_normal((30, d)).astype(np.float32)
    a = rng.integers(0, 30, size=n)
    x = centers[a] + 0.1 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 30, size=40)] + 0.1 * rng.standard_normal(
        (40, d)
    ).astype(np.float32)

    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = ShardedGraphIndex(mesh, d, cfg, cap_per_shard=512)
    assign = np.arange(n) % idx.n_shards
    idx.insert(x, assign)
    idx.attach_packed(dp=16, train_sample=x[:512])

    dists, gids, _ = idx.search(q, k=10, l_search=40, mode="packed")
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    r = knn_recall(gids, gt_i, 10)
    assert r >= 0.9, r


def _clustered(rng, n, d, nc=24, sigma=0.1):
    centers = rng.standard_normal((nc, d)).astype(np.float32)
    a = rng.integers(0, nc, size=n)
    x = centers[a] + sigma * rng.standard_normal((n, d)).astype(np.float32)
    return x, centers


def test_sharded_overlap2_dedup(rng, mesh):
    """overlap=2 routing stores every vector in its 2 nearest shards; the
    all-gather merge dedups by external id (`partition.rs:23` semantics)."""
    from diskann_tpu.parallel.partition import kmeans_partition

    n, d = 1200, 16
    x, centers = _clustered(rng, n, d, nc=16, sigma=0.1)
    _, assign = kmeans_partition(x, 8, overlap=2)
    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = ShardedGraphIndex(mesh, d, cfg, cap_per_shard=1024)
    ext = idx.insert(x, assign)
    np.testing.assert_array_equal(ext, np.arange(n))
    # each external id is stored in exactly 2 shards (count device-side —
    # there is no host id map by design)
    ext_cols = np.asarray(idx.ext)
    copies = np.bincount(ext_cols[ext_cols >= 0], minlength=n)
    assert (copies == 2).all()
    q = centers[rng.integers(0, 16, size=40)] + 0.1 * rng.standard_normal(
        (40, d)
    ).astype(np.float32)
    dists, gids, _ = idx.search(q, k=10, l_search=40)
    # merged results never contain a duplicated external id
    for row in gids:
        live = row[row >= 0]
        assert len(np.unique(live)) == len(live)
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    assert knn_recall(gids, gt_i, 10) >= 0.9


def test_sharded_overflow_grow_and_error(rng, mesh):
    d = 8
    x = rng.standard_normal((400, d)).astype(np.float32)
    cfg = GraphConfig(max_degree=8, l_build=16)
    idx = ShardedGraphIndex(mesh, d, cfg, cap_per_shard=32)
    with pytest.raises(ValueError, match="overflow"):
        idx.insert(x, np.zeros(400, np.int64), on_overflow="error")
    # default grows instead of dropping
    idx2 = ShardedGraphIndex(mesh, d, cfg, cap_per_shard=32)
    ext = idx2.insert(x[:256], np.zeros(256, np.int64))
    assert idx2.cap_per_shard >= 256
    assert int(np.asarray(idx2.ns)[0]) == 256
    _, gids, _ = idx2.search(x[:8] + 0.001, k=1, l_search=16)
    assert (gids[:, 0] == np.arange(8)).all()


def test_sharded_delete(rng, mesh):
    n, d = 1200, 16
    x, centers = _clustered(rng, n, d)
    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = ShardedGraphIndex(mesh, d, cfg, cap_per_shard=512)
    idx.insert(x)
    dead = rng.choice(n, size=200, replace=False)
    idx.delete(dead)
    alive = np.setdiff1d(np.arange(n), dead)
    q = x[alive[:40]] + 0.02
    _, gids, _ = idx.search(q, k=10, l_search=48)
    assert not np.isin(gids[gids >= 0], dead).any()
    flat = FlatIndex(x[alive], Metric.L2)
    _, gt_i = flat.search(q, k=10)
    assert knn_recall(gids, alive[gt_i], 10) >= 0.85


def test_sharded_save_load(tmp_path, rng, mesh):
    n, d = 800, 16
    x, centers = _clustered(rng, n, d)
    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = ShardedGraphIndex(mesh, d, cfg, cap_per_shard=256)
    idx.insert(x)
    q = x[:24] + 0.01
    want_d, want_i, _ = idx.search(q, k=10, l_search=40)
    p = str(tmp_path / "sharded")
    idx.save(p)
    re = ShardedGraphIndex.load(mesh, p)
    got_d, got_i, _ = re.search(q, k=10, l_search=40)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5)
    # reloaded index keeps working for updates
    more = rng.standard_normal((32, d)).astype(np.float32)
    ext = re.insert(more)
    assert ext[0] == n


def test_sharded_range_search(rng, mesh):
    """Radius search over the mesh: union of shard-local results, overlap
    duplicates removed, no false positives vs the exact scan."""
    n, d = 1200, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = ShardedGraphIndex(mesh, d, cfg, cap_per_shard=512)
    assign = np.stack(
        [np.arange(n) % idx.n_shards, (np.arange(n) + 3) % idx.n_shards],
        axis=1,
    )
    idx.insert(x, assign)
    q = x[rng.choice(n, size=5, replace=False)] + 0.01
    dall = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    radius = float(np.quantile(dall, 0.008))
    got = idx.search_range(q, radius, l_init=32)
    for b in range(len(q)):
        want = set(np.nonzero(dall[b] <= radius)[0].tolist())
        have = list(int(i) for i in got[b])
        assert len(have) == len(set(have))  # dedup across overlap copies
        assert set(have) <= want, set(have) - want
        assert len(have) >= 0.85 * len(want), (len(have), len(want))


def test_sharded_freelist_recycles_slots(rng, mesh):
    """Deleted slots are reused by later inserts: the per-shard high-water
    mark must not grow when free slots cover the new batch (reference
    freelist semantics, `diskann-inmem/src/freelist.rs`)."""
    d = 8
    cfg = GraphConfig(max_degree=8, l_build=16)
    idx = ShardedGraphIndex(mesh, d, cfg, cap_per_shard=128)
    x = rng.standard_normal((256, d)).astype(np.float32)
    ext = idx.insert(x)
    ns_before = np.asarray(idx.ns).copy()
    # delete one full round-robin stripe (one slot per shard x 8)
    idx.delete(ext[:64])
    assert idx._free_total == 64
    y = rng.standard_normal((64, d)).astype(np.float32)
    ext2 = idx.insert(y)
    ns_after = np.asarray(idx.ns)
    np.testing.assert_array_equal(ns_before, ns_after)  # recycled, no growth
    # deleted ids gone, new ids findable
    dists, gids, _ = idx.search(y[:16], k=1, l_search=24)
    hit = (gids[:, 0] >= 0)
    assert hit.all()
    assert not np.isin(gids[:, 0], ext[:64]).any()
    found = np.isin(ext2, gids[:, 0]).sum()
    assert found >= 12  # most nearest-neighbors are the new rows themselves


def test_sharded_delete_of_start_node_and_packed_mirror(rng, mesh):
    """Two regressions in one flow: (1) deleting rows that include a
    shard's medoid start must refresh the start (a dead entry point
    silently craters recall — the reference recomputes start points on
    delete, `start_point.rs:19-41`); (2) with packed attached, insert and
    delete maintain the fat-row mirror INSIDE their own programs (no
    re-attach), so packed search stays consistent afterwards."""
    n, d = 2000, 32
    centers = rng.standard_normal((24, d)).astype(np.float32) * 2
    x = centers[rng.integers(0, 24, size=n)] + 0.3 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    q = centers[rng.integers(0, 24, size=40)] + 0.3 * rng.standard_normal(
        (40, d)
    ).astype(np.float32)
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)

    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = ShardedGraphIndex(mesh, d, cfg, cap_per_shard=1024)
    eids = idx.insert(x)
    idx.attach_packed(dp=32)
    # near-origin rows: closer to the dataset mean than any clustered
    # point, so each shard's medoid start moves onto them...
    new = rng.standard_normal((64, d)).astype(np.float32) * 0.05
    e2 = idx.insert(new)
    starts = np.asarray(idx.starts).ravel()
    ecol = np.asarray(idx.ext)
    start_ext = np.array([ecol[s, starts[s]] for s in range(len(starts))])
    assert (start_ext >= n).any(), "precondition: a start moved to a new row"
    # ...and deleting them all must refresh the starts, not search from
    # dead nodes
    idx.delete(e2)
    starts2 = np.asarray(idx.starts).ravel()
    valid = np.asarray(idx.stacked.valid)
    assert all(valid[s, starts2[s]] for s in range(len(starts2)))
    for mode in (None, "packed"):
        kw = {"mode": mode} if mode else {}
        _, gids, _ = idx.search(q, k=10, l_search=48, **kw)
        assert knn_recall(gids, eids[gt_i], 10) >= 0.9, mode
