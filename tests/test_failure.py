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
