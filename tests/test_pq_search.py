"""PQ-guided traversal + full-precision rerank (the SSD-tier flow on HBM)."""

import numpy as np
import pytest

from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
from diskann_tpu.bench.recall import knn_recall


def test_pq_search_recall(rng):
    n, d = 2000, 32
    centers = rng.standard_normal((40, d)).astype(np.float32) * 2
    a = rng.integers(0, 40, size=n)
    x = centers[a] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    qa = rng.integers(0, 40, size=60)
    q = centers[qa] + 0.2 * rng.standard_normal((60, d)).astype(np.float32)

    cfg = GraphConfig(max_degree=24, l_build=48)
    idx = GraphIndex.build(x, cfg, insert_batch_size=512)
    idx.attach_pq(n_chunks=8)

    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    _, ids_full, _ = idx.search(q, k=10, l_search=48)
    _, ids_pq, _ = idx.search(q, k=10, l_search=48, mode="pq")

    r_full = knn_recall(ids_full, gt_i, 10)
    r_pq = knn_recall(ids_pq, gt_i, 10)
    assert r_full >= 0.95
    # PQ traversal + rerank should stay close to full-precision recall
    assert r_pq >= r_full - 0.08, (r_pq, r_full)


def test_pq_search_excludes_deleted(rng):
    n, d = 800, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = GraphIndex.build(x, GraphConfig(max_degree=16, l_build=32),
                           insert_batch_size=256)
    idx.attach_pq(n_chunks=4)
    dead = rng.choice(n, size=100, replace=False)
    idx.delete(dead)
    _, ids, _ = idx.search(x[dead[:20]] + 0.01, k=5, l_search=32, mode="pq")
    assert not np.isin(ids[ids >= 0], dead).any()


def test_sq_search_recall(rng):
    n, d = 1500, 24
    centers = rng.standard_normal((30, d)).astype(np.float32) * 2
    a = rng.integers(0, 30, size=n)
    x = centers[a] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 30, size=50)] + 0.2 * rng.standard_normal(
        (50, d)
    ).astype(np.float32)

    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = GraphIndex.build(x, cfg, insert_batch_size=512)
    idx.attach_sq()

    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    _, ids_sq, _ = idx.search(q, k=10, l_search=40, mode="sq", beam_width=4)
    assert knn_recall(ids_sq, gt_i, 10) >= 0.9


def test_packed_search_recall(rng):
    n, d = 1500, 32
    centers = rng.standard_normal((30, d)).astype(np.float32) * 2
    a = rng.integers(0, 30, size=n)
    x = centers[a] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 30, size=50)] + 0.2 * rng.standard_normal(
        (50, d)
    ).astype(np.float32)

    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = GraphIndex.build(x, cfg, insert_batch_size=512)
    idx.attach_packed(dp=16)

    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    _, ids, _ = idx.search(q, k=10, l_search=40, mode="packed", beam_width=4)
    assert knn_recall(ids, gt_i, 10) >= 0.9


def test_packed_build_mode_recall(rng):
    n, d = 2000, 32
    centers = rng.standard_normal((40, d)).astype(np.float32) * 2
    a = rng.integers(0, 40, size=n)
    x = centers[a] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 40, size=60)] + 0.2 * rng.standard_normal(
        (60, d)
    ).astype(np.float32)

    cfg = GraphConfig(max_degree=24, l_build=48, beam_width=4)
    idx = GraphIndex.build(x, cfg, insert_batch_size=512,
                           build_mode="packed", packed_dp=16)
    assert idx.packed is not None

    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    # the incrementally-maintained packed layout serves search directly
    _, ids_p, _ = idx.search(q, k=10, l_search=48, mode="packed")
    _, ids_f, _ = idx.search(q, k=10, l_search=48, mode="full")
    r_p = knn_recall(ids_p, gt_i, 10)
    r_f = knn_recall(ids_f, gt_i, 10)
    assert r_f >= 0.9, r_f   # packed-built graph quality
    assert r_p >= 0.85, r_p


def test_merge_dedup_matches_list(rng):
    # dedup="merge" (dedup inside the merge sort) must return exactly the
    # same results as dedup="list" (explicit membership compare)
    from diskann_tpu.graph.scorers import packed_scorer
    from diskann_tpu.graph.search import beam_search_scored

    n, d = 1200, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((40, d)).astype(np.float32)
    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = GraphIndex.build(x, cfg, insert_batch_size=512)
    idx.attach_packed(dp=16)

    sdef, sdata = packed_scorer(idx.packed, Metric.L2)
    import jax.numpy as jnp

    start = idx._start()
    out = {}
    for mode in ("list", "merge"):
        res = beam_search_scored(
            sdef, sdata, idx.state.adjacency, start, jnp.asarray(q),
            l_search=24, beam_width=4, max_hops=64,
            dedup=mode, expand_r=idx.packed.r_pack,
        )
        out[mode] = res
    np.testing.assert_array_equal(
        np.asarray(out["list"].ids), np.asarray(out["merge"].ids)
    )
    np.testing.assert_allclose(
        np.asarray(out["list"].dists), np.asarray(out["merge"].dists)
    )
    np.testing.assert_array_equal(
        np.asarray(out["list"].cmps), np.asarray(out["merge"].cmps)
    )


def test_spherical_search_recall(rng):
    # sub-byte (4-bit) spherical traversal + full-precision rerank
    n, d = 1500, 32
    centers = rng.standard_normal((30, d)).astype(np.float32) * 2
    a = rng.integers(0, 30, size=n)
    x = centers[a] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 30, size=50)] + 0.2 * rng.standard_normal(
        (50, d)
    ).astype(np.float32)

    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = GraphIndex.build(x, cfg, insert_batch_size=512)
    idx.attach_spherical(n_bits=4)

    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    _, ids, _ = idx.search(q, k=10, l_search=48, mode="spherical",
                           beam_width=4)
    assert knn_recall(ids, gt_i, 10) >= 0.9

def test_packed_unroll_exact_parity(rng):
    """unroll_hops statically unrolls the composed hop loop; results must be
    bit-identical to the while_loop (converged rows select no frontier, so
    running extra body instances to the cap is a masked no-op)."""
    n, d = 1500, 32
    centers = rng.standard_normal((30, d)).astype(np.float32) * 2
    a = rng.integers(0, 30, size=n)
    x = centers[a] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 30, size=50)] + 0.2 * rng.standard_normal(
        (50, d)
    ).astype(np.float32)

    idx = GraphIndex.build(x, GraphConfig(max_degree=16, l_build=32),
                           insert_batch_size=512)
    idx.attach_packed(dp=16)
    d0, i0, s0 = idx.search(q, k=10, l_search=40, mode="packed",
                            beam_width=4, max_hops=6)
    idx.unroll_hops = True
    d1, i1, s1 = idx.search(q, k=10, l_search=40, mode="packed",
                            beam_width=4, max_hops=6)
    idx.unroll_hops = False
    assert np.array_equal(i0, i1)
    assert np.array_equal(d0, d1)
    assert np.array_equal(s0.cmps, s1.cmps)


def test_packed_bf16_router_recall(rng):
    """router_compute="bf16" only changes ENTRY-POINT selection math; the
    walk + exact rerank must keep recall within noise of the int8 router."""
    n, d = 2000, 32
    centers = rng.standard_normal((40, d)).astype(np.float32) * 2
    a = rng.integers(0, 40, size=n)
    x = centers[a] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 40, size=60)] + 0.2 * rng.standard_normal(
        (60, d)
    ).astype(np.float32)

    idx = GraphIndex.build(x, GraphConfig(max_degree=24, l_build=48),
                           insert_batch_size=512)
    idx.attach_packed(dp=16)
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    _, i0, _ = idx.search(q, k=10, l_search=40, mode="packed", beam_width=4)
    idx.router_compute = "bf16"
    _, i1, _ = idx.search(q, k=10, l_search=40, mode="packed", beam_width=4)
    idx.router_compute = "int8"
    r0 = knn_recall(i0, gt_i, 10)
    r1 = knn_recall(i1, gt_i, 10)
    assert r1 >= r0 - 0.05, (r0, r1)


def test_pq4_masked_adc_matches_gather_formulation(rng):
    """The k<=32 masked-reduction ADC must produce the SAME distances as
    the classic per-scalar LUT gather (they are two formulations of one
    sum); and 4-bit traversal+rerank recall must hold up."""
    import jax.numpy as jnp

    from diskann_tpu.graph.scorers import pq_scorer
    from diskann_tpu.quant.pq import train_pq
    import jax

    n, d, b, c = 600, 32, 16, 24
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    pq = train_pq(jax.random.key(0), x, n_chunks=16, n_centers=16)
    codes = pq.encode(x)
    sdef, sdata = pq_scorer(codes, pq.pivots, Metric.L2)
    ids = jnp.asarray(rng.integers(0, n, size=(b, c)).astype(np.int32))
    valid = jnp.asarray(rng.random((b, c)) < 0.9)

    ctx = sdef.prep(sdata, jnp.asarray(q))
    d_fast = np.asarray(sdef.score(sdata, ctx, ids, valid))

    # reference formulation: explicit scalar LUT walk
    lut = np.asarray(ctx).reshape(b, 16, 16)
    cN = np.asarray(codes)
    d_ref = np.full((b, c), np.inf, np.float32)
    for bi in range(b):
        for ci in range(c):
            if valid[bi, ci]:
                d_ref[bi, ci] = lut[bi, np.arange(16),
                                    cN[ids[bi, ci]]].sum()
    finite = np.isfinite(d_ref)
    np.testing.assert_allclose(d_fast[finite], d_ref[finite],
                               rtol=1e-4, atol=1e-3)
    assert (np.isinf(d_fast) == ~finite).all()


def test_pq4_traversal_recall(rng):
    n, d = 2000, 32
    centers = rng.standard_normal((40, d)).astype(np.float32) * 2
    a = rng.integers(0, 40, size=n)
    x = centers[a] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 40, size=60)] + \
        0.2 * rng.standard_normal((60, d)).astype(np.float32)

    idx = GraphIndex.build(x, GraphConfig(max_degree=24, l_build=48),
                           insert_batch_size=512)
    # 4-bit at 2x chunks = same code bytes as the 8-bit test above
    idx.attach_pq(n_chunks=16, n_centers=16)
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    _, ids_pq4, _ = idx.search(q, k=10, l_search=48, mode="pq")
    assert knn_recall(ids_pq4, gt_i, 10) >= 0.88
