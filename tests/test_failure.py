"""Failure model: rollback and abort semantics.

The reference uses `Guard` drop-without-complete for insert rollback
(`diskann/src/provider.rs:292-315`) and a ranked transient-vs-hard error
model (`diskann/src/error/ranked.rs`).  The TPU analogue is functional:
a batch that aborts mid-flight simply never commits its state pytree, so
"rollback" is keeping the previous `GraphArrays` reference — these tests
pin that contract (flagged untested in round 1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
from diskann_tpu.bench.recall import knn_recall


def _mk(rng, n=800, d=16):
    centers = rng.standard_normal((12, d)).astype(np.float32)
    a = rng.integers(0, 12, size=n)
    return centers[a] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)


def test_mid_batch_abort_leaves_state_untouched(rng):
    """Simulated abort: run the batched insert kernel but do NOT commit —
    the live index state must be byte-identical (Guard-drop rollback)."""
    from diskann_tpu.graph.build import insert_batch

    x = _mk(rng)
    idx = GraphIndex.build(x[:512], GraphConfig(max_degree=12, l_build=24),
                           insert_batch_size=256)
    before_adj = np.asarray(idx.state.adjacency)
    before_valid = np.asarray(idx.state.valid)
    before_n = idx.n

    # the "attempt": a full batched insert into a THROWAWAY copy of the
    # state (donation consumes the copy, never the live buffers)
    m = 256
    copy = idx.state._replace(
        adjacency=idx.state.adjacency + 0,
        vectors=idx.state.vectors + 0,
        sq_norms=idx.state.sq_norms + 0,
        degrees=idx.state.degrees + 0,
        valid=idx.state.valid & True,
        vec_sum=idx.state.vec_sum + 0,
    )
    slots = jnp.arange(idx.n, idx.n + m, dtype=jnp.int32)
    new = _mk(rng, n=m)
    aborted_state, _, _ = insert_batch(
        copy, slots, jnp.asarray(new), jnp.ones((m,), bool),
        idx._start(), idx.config,
    )
    # abort: drop `aborted_state` on the floor — the index never sees it
    del aborted_state

    assert idx.n == before_n
    np.testing.assert_array_equal(np.asarray(idx.state.adjacency), before_adj)
    np.testing.assert_array_equal(np.asarray(idx.state.valid), before_valid)
    # and the index still searches correctly
    _, ids, _ = idx.search(x[:8] + 0.01, k=5, l_search=24)
    assert (ids[:, 0] >= 0).all()


def test_insert_exception_does_not_corrupt(rng):
    """A host-side failure mid-insert (bad input shape) must leave the
    index usable: the facade validates/pads before any commit."""
    x = _mk(rng)
    idx = GraphIndex.build(x, GraphConfig(max_degree=12, l_build=24),
                           insert_batch_size=256)
    n0 = idx.n_live
    with pytest.raises(Exception):
        idx.insert(np.zeros((4, idx.dim + 3), np.float32))  # wrong dim
    assert idx.n_live == n0
    _, ids, _ = idx.search(x[:8] + 0.01, k=5, l_search=24)
    assert (ids[:, 0] >= 0).all()


def test_search_tolerates_corrupt_adjacency_entries(rng):
    """Transient-error analogue: adjacency entries pointing at garbage ids
    (out-of-range / deleted) are masked, never crash, never surface
    (`allow_transient` semantics, `error/ranked.rs`)."""
    x = _mk(rng)
    idx = GraphIndex.build(x, GraphConfig(max_degree=12, l_build=24),
                           insert_batch_size=256)
    adj = np.array(idx.state.adjacency)
    rows = rng.choice(idx.n, size=50, replace=False)
    adj[rows, 0] = idx.state.capacity + 1000   # out of range
    adj[rows, 1] = -7                          # negative garbage
    idx.state = idx.state._replace(adjacency=jnp.asarray(adj))
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(x[:40] + 0.01, k=10)
    _, ids, _ = idx.search(x[:40] + 0.01, k=10, l_search=32)
    assert (ids[ids >= 0] <= idx.n).all()
    assert knn_recall(ids, gt_i, 10) >= 0.85


# ---------------------------------------------------------------------------
# Fault-injecting test provider (reference pedantic provider,
# `diskann/src/graph/test/provider.rs:1-70`): a deterministic fraction of
# fetches fail transiently; search/prune must degrade, never corrupt.
# ---------------------------------------------------------------------------

def _faulty_search(rng, fail_fraction, salt=3):
    from diskann_tpu.graph.scorers import full_precision_scorer
    from diskann_tpu.graph.search import beam_search_scored
    from diskann_tpu.testing import FaultStats, faulty_scorer

    x = _mk(rng, n=600)
    idx = GraphIndex.build(x, GraphConfig(max_degree=12, l_build=24),
                           insert_batch_size=256)
    q = x[:32] + 0.01
    base_def, base_data = full_precision_scorer(
        idx.state.vectors, idx.state.sq_norms, idx.config.metric
    )
    stats = FaultStats()
    sdef, sdata = faulty_scorer(
        base_def, base_data, fail_fraction=fail_fraction, salt=salt,
        stats=stats,
    )
    res = beam_search_scored(
        sdef, sdata, idx.state.adjacency, idx._start(), jnp.asarray(q),
        l_search=24, history_capacity=8192,
    )
    return x, q, res, stats


def test_faulty_scorer_zero_fraction_is_exact(rng):
    x, q, res, _ = _faulty_search(rng, 0.0)
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    assert knn_recall(np.asarray(res.ids), gt_i, 10) >= 0.9


@pytest.mark.parametrize("frac", [0.1, 0.5])
def test_faulty_scorer_degrades_without_corruption(rng, frac):
    """Surviving results carry EXACT distances and real ids; failures only
    lose candidates (allow_transient), never fabricate or crash."""
    x, q, res, stats = _faulty_search(rng, frac)
    ids = np.asarray(res.ids)
    d = np.asarray(res.dists)
    ok = ids >= 0
    assert ok[:, 0].any()                      # still returns something
    assert (ids[ok] < len(x)).all()            # ids are real
    # every returned distance matches an exact recompute (no corruption)
    exact = ((q[:, None, :] - x[ids.clip(0)]) ** 2).sum(-1)
    np.testing.assert_allclose(d[ok], exact[ok], rtol=1e-4, atol=1e-4)
    # a failed id never surfaces in the results
    from diskann_tpu.testing import count_failed
    assert count_failed(ids[ok], frac, salt=3) == 0
    assert stats.score_calls >= 1


def test_faulty_scorer_recall_monotone(rng):
    """More injected failures -> recall can only degrade (statistically;
    asserted with slack on a fixed seed)."""
    x, q, res0, _ = _faulty_search(rng, 0.0)
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    r0 = knn_recall(np.asarray(res0.ids), gt_i, 10)
    _, _, res5, _ = _faulty_search(np.random.default_rng(0), 0.5, salt=3)
    # note: _mk uses the rng, so rebuild with the same stream for fairness
    x2, q2, res5, _ = _faulty_search(np.random.default_rng(1234), 0.5)
    gt_d2, gt_i2 = FlatIndex(x2, Metric.L2).search(q2, k=10)
    r5 = knn_recall(np.asarray(res5.ids), gt_i2, 10)
    assert r5 <= r0 + 0.02


def test_prune_tolerates_failed_fetches(rng):
    """RobustPrune with failed candidate fetches == pruning the surviving
    subset (`prune.rs:93-174` drops candidates whose vector fetch failed)."""
    from diskann_tpu.graph.prune import robust_prune
    from diskann_tpu.testing import _fail_mask

    cfg = GraphConfig(max_degree=8, l_build=24)
    d_dim, c = 16, 40
    p = rng.standard_normal((6, d_dim)).astype(np.float32)
    cand_vecs = rng.standard_normal((6, c, d_dim)).astype(np.float32)
    cand_ids = np.tile(np.arange(1, c + 1, dtype=np.int32), (6, 1))
    self_ids = np.zeros((6,), np.int32)

    fail = np.asarray(_fail_mask(jnp.asarray(cand_ids), 300, 7))
    # injected run: failed fetches surface as id -1 (transient -> dropped)
    inj_ids = np.where(fail, -1, cand_ids)
    r_inj = robust_prune(
        jnp.asarray(p), jnp.asarray(inj_ids), None, jnp.asarray(cand_vecs),
        jnp.asarray(self_ids), cfg,
    )
    # oracle: prune over only the surviving candidates
    r_ref = robust_prune(
        jnp.asarray(p), jnp.asarray(np.where(fail, -1, cand_ids)), None,
        jnp.asarray(np.where(fail[:, :, None], 0.0, cand_vecs)),
        jnp.asarray(self_ids), cfg,
    )
    np.testing.assert_array_equal(np.asarray(r_inj.ids), np.asarray(r_ref.ids))
    got = np.asarray(r_inj.ids)
    assert (got[got >= 0] <= c).all()
    # no failed id was promoted
    surviving = set(inj_ids[inj_ids >= 0].tolist())
    assert set(got[got >= 0].tolist()) <= surviving
    # degree bound holds
    assert (np.asarray(r_inj.count) <= cfg.max_degree).all()
