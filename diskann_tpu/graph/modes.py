"""Additional search modes: range, paged, diversity-aware top-k.

References:
- Range search: `diskann/src/graph/search/range_search.rs` — two-round
  radius search: a k-NN pass sized L, doubled while the result boundary
  still lies inside the radius.
- Paged search: `diskann/src/graph/search/paged.rs:27-53` — pagination over
  one logical result stream.  The scratch (`ResumeState`) persists across
  calls: each page DRAINS the returned entries from the best list and
  resumes the beam loop, so page N costs only the incremental expansion —
  the reference's `drain_best` + `search_internal` resume, functionally.
- Diverse search: `diskann/src/graph/search/diverse_search.rs:104` — top-k
  constrained to at most `max_per_attribute` results sharing an attribute
  value, greedily in distance order.  Device formulation: an entry is kept
  iff its rank among same-attribute candidates is < quota (the greedy scan
  admits the first `quota` of every attribute), which is two sorts + a
  segmented iota — no host loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def range_search(
    index,
    queries,
    radius: float,
    *,
    l_init: int | None = None,
    l_max: int = 8192,
    mode: str = "full",
    return_complete: bool = False,
    resume: bool = True,
):
    """All ids within `radius` of each query (reference `Range::search`
    two-round scheme). Returns a list of id arrays (variable length); with
    ``return_complete=True`` also a ``[B] bool`` array marking queries whose
    radius boundary was provably found (the furthest retrieved point lies
    OUTSIDE the radius, or the graph ran out of reachable points).  A query
    still hitting the ``l_max`` window cap reports ``complete=False`` instead
    of silently truncating.

    For a plain GraphIndex full-precision search the L-doubling rounds RESUME
    the prior round's scratch (`grow_resume_state`) instead of re-searching
    from the start points — the reference restarts each round
    (`range_search.rs` two-round search); resuming pays only the incremental
    frontier."""
    queries = np.asarray(queries, np.float32)
    if queries.ndim == 1:
        queries = queries[None]
    b = queries.shape[0]
    l = l_init or max(32, index.config.l_build)
    if resume and mode == "full" and hasattr(index, "_scorer_for_mode") \
            and not getattr(index, "_hbm_vectors_dropped", False):
        d, ids = _range_rounds_resume(index, queries, radius, l, l_max)
    else:
        d, ids = _range_rounds_restart(index, queries, radius, l, l_max, mode)
    results: list[np.ndarray] = [np.empty(0, np.int64)] * b
    complete = np.zeros(b, bool)
    for i in range(b):
        inside = (ids[i] >= 0) & (d[i] <= radius)
        results[i] = ids[i][inside].astype(np.int64)
        full = (ids[i] >= 0).all()
        complete[i] = (not full) or (d[i][-1] > radius)
    if return_complete:
        return results, complete
    return results


def _range_rounds_restart(index, queries, radius, l, l_max, mode):
    """L-doubling rounds, each a fresh search (composite indexes whose
    search() is itself a multi-dispatch pipeline)."""
    import inspect

    # tiered/sharded indexes have no `mode` kwarg (their tier IS the mode)
    kw = (
        {"mode": mode}
        if "mode" in inspect.signature(index.search).parameters
        else {}
    )
    while True:
        d, ids, _ = index.search(queries, k=l, l_search=l, **kw)
        full = (ids >= 0).all(axis=1)
        done = ~full | (d[:, -1] > radius)
        if done.all() or l >= l_max:
            return d, ids
        l = min(2 * l, l_max)


def _range_rounds_resume(index, queries, radius, l, l_max):
    """L-doubling rounds over ONE persistent search scratch: each round
    grows the window (`grow_resume_state`) and resumes, so already-expanded
    nodes are never re-walked."""
    import jax.numpy as jnp

    from diskann_tpu.graph.search import (
        beam_search_scored, grow_resume_state, search_geometry,
    )

    sdef, sdata, expand_r = index._scorer_for_mode("full")
    start = index._start()
    w = index.config.beam_width
    q = jnp.asarray(queries)
    st = None
    while True:
        geo = dict(
            l_search=l, reserve=0, beam_width=w,
            r=index.state.adjacency.shape[1], s=start.shape[-1],
            history_capacity=index.config.history_capacity(l),
        )
        l_tot, _, h = search_geometry(**geo)
        if st is not None:
            st = grow_resume_state(st, l_tot, h)
        res, st = beam_search_scored(
            sdef, sdata, index.state.adjacency, start, q,
            l_search=l, beam_width=w, max_hops=index.config.max_hops,
            history_capacity=index.config.history_capacity(l),
            expand_r=expand_r,
            resume_state=st, return_state=True,
            reseed_ring=st is not None,
        )
        d = np.asarray(res.dists[:, :l])
        ids = np.asarray(res.ids[:, :l])
        valid = np.asarray(index.state.valid)
        live = (ids >= 0) & valid[np.clip(ids, 0, len(valid) - 1)]
        d = np.where(live, d, np.inf)
        ids = np.where(live, ids, -1)
        order = np.argsort(d, axis=1)
        d = np.take_along_axis(d, order, axis=1)
        ids = np.take_along_axis(ids, order, axis=1)
        full = (ids >= 0).all(axis=1)
        done = ~full | (d[:, -1] > radius)
        if done.all() or l >= l_max:
            return d, ids
        l = min(2 * l, l_max)


@partial(jax.jit, static_argnames=())
def _drain_state(state, drain_ids):
    """Remove `drain_ids` from the best list (reference `drain_best`):
    drained slots become (inf, -1, expanded) and one sort pushes them out,
    freeing room for farther candidates on the next resume."""
    from diskann_tpu.graph.search import ResumeState

    hit = jnp.any(
        state.best_i[:, :, None] == drain_ids[None, None, :], axis=-1
    ) & (state.best_i >= 0)
    bd = jnp.where(hit, jnp.inf, state.best_d)
    bi = jnp.where(hit, -1, state.best_i)
    be = jnp.where(hit, 1, state.best_exp)
    bd, bi, be = jax.lax.sort((bd, bi, be), dimension=-1, num_keys=1)
    return ResumeState(
        best_d=bd, best_i=bi, best_exp=be, ring=state.ring,
        cmps=state.cmps, hops=state.hops,
        match_d=state.match_d, match_i=state.match_i,
    )


class PagedSearch:
    """Resumable pagination over one query's result stream
    (`PagedSearch::next_page`, `paged.rs:27-53`): the search scratch
    persists; each page drains what it returns and resumes the beam loop,
    so page N costs only the incremental graph expansion (NOT a re-search
    at larger L).  Pages are non-overlapping; within a page results are
    distance-sorted (cross-page monotonicity is not guaranteed — same
    contract as the reference)."""

    def __init__(self, index, query, *, l_search: int | None = None,
                 mode: str = "full", page_l_slack: int = 16,
                 reserve: int | None = None):
        self.index = index
        self.query = np.asarray(query, np.float32).reshape(1, -1)
        self.mode = mode
        self.l = l_search or max(page_l_slack, index.config.l_build)
        # reserve slots hold scored-but-outside-L candidates (the reference
        # queue is auto-resizable, `queue.rs:174`); draining slides them
        # into the active window so later pages keep streaming
        self.reserve = 3 * self.l if reserve is None else reserve
        self.exhausted = False
        self.state = None
        self._served: set[int] = set()

    def _run(self, resume):
        from diskann_tpu.graph.search import beam_search_scored

        idx = self.index
        sdef, sdata, expand_r = idx._scorer_for_mode(self.mode)
        res, st = beam_search_scored(
            sdef, sdata, idx.state.adjacency, idx._start(),
            jnp.asarray(self.query),
            l_search=self.l, beam_width=idx.config.beam_width,
            max_hops=idx.config.max_hops,
            history_capacity=idx.config.history_capacity(self.l),
            expand_r=expand_r,
            resume_state=resume, return_state=True,
            reserve=self.reserve,
        )
        self.state = st
        return res

    def next_page(self, k: int):
        if self.exhausted:
            return np.empty(0, np.float32), np.empty(0, np.int64)
        res = self._run(self.state)
        ids = np.asarray(res.ids[0])
        dists = np.asarray(res.dists[0])
        valid = np.asarray(self.index.state.valid)
        ok = (ids >= 0) & valid[np.clip(ids, 0, len(valid) - 1)]
        # the drain guarantees non-overlap; _served guards the edge where a
        # drained id ages out of the ring and is re-discovered
        ok &= ~np.isin(ids, np.fromiter(self._served, np.int64, len(self._served)))
        take = np.nonzero(ok)[0][:k]
        if len(take) == 0:
            self.exhausted = True
            return np.empty(0, np.float32), np.empty(0, np.int64)
        page_i = ids[take]
        page_d = dists[take]
        self._served.update(int(i) for i in page_i)
        pad = np.full((max(k, 1),), -1, np.int32)
        pad[: len(page_i)] = page_i
        self.state = _drain_state(self.state, jnp.asarray(pad))
        return page_d.astype(np.float32), page_i.astype(np.int64)


@partial(jax.jit, static_argnames=("k", "max_per_attribute"))
def diverse_topk_device(dists, ids, attrs, k: int, max_per_attribute: int):
    """Batched greedy diversity-constrained top-k, fully on device.

    The greedy scan (`diverse_search.rs:104` / DiversePriorityQueue) admits
    a candidate iff fewer than `max_per_attribute` earlier (closer)
    candidates share its attribute — because the first `quota` of every
    attribute are all admitted, "earlier admitted same-attr" equals
    "earlier same-attr".  So: rank candidates within equal-attribute groups
    (sort by (attr, position), segmented iota, invert the permutation),
    mask rank >= quota, compact the keepers left.  Two small sorts + one
    vmapped slot write — no host loop."""
    from diskann_tpu.ops.topk import grouped_ranks

    b, l = ids.shape
    cap = attrs.shape[0]
    valid = ids >= 0
    a = jnp.where(valid, attrs[jnp.clip(ids, 0, cap - 1)], jnp.int32(2**31 - 1))
    rank = grouped_ranks(a)
    keep = valid & (rank < max_per_attribute)
    slot = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    slot = jnp.where(keep & (slot < k), slot, k)
    out_d = jnp.full((b, k), jnp.inf, dists.dtype)
    out_i = jnp.full((b, k), -1, ids.dtype)
    out_d = jax.vmap(lambda o, p, v: o.at[p].set(v, mode="drop"))(out_d, slot, dists)
    out_i = jax.vmap(lambda o, p, v: o.at[p].set(v, mode="drop"))(out_i, slot, ids)
    return out_d, out_i


def diverse_topk(
    dists: np.ndarray,     # [B, L] ascending
    ids: np.ndarray,       # [B, L]
    attrs: np.ndarray,     # [cap] attribute value per point
    k: int,
    max_per_attribute: int,
):
    """Host wrapper over the device kernel (kept for API compat; the scalar
    oracle lives in tests/reference_impl.py)."""
    od, oi = diverse_topk_device(
        jnp.asarray(np.asarray(dists, np.float32)),
        jnp.asarray(np.asarray(ids, np.int32)),
        jnp.asarray(np.asarray(attrs, np.int32)),
        k, max_per_attribute,
    )
    return np.asarray(od), np.asarray(oi).astype(np.int64)


@partial(jax.jit, static_argnames=("k", "power", "eta"))
def determinant_diversity_device(cand_vecs, cand_d, valid, k: int,
                                 power: float = 1.0, eta: float = 0.0):
    """Batched Determinant-Diversity rerank (`diskann-providers/src/model/
    graph/provider/determinant_diversity.rs`): greedily maximize
    det(X_S X_S^T + eta I) over size-k subsets of relevance-scaled
    candidates via pivoted Gram-Schmidt.

    Per iteration: pick the residual with the largest norm, deflate the
    rest against it (one [B, C, d] x [B, d] contraction per step — the
    reference's O(n*k*dim) loop becomes k MXU contractions).

    Returns positions [B, k] into the candidate axis (-1 = none), in
    selection (pivot) order."""
    b, c, d = cand_vecs.shape
    eps = jnp.float32(np.finfo(np.float32).eps)
    dmasked = jnp.where(valid, cand_d, -jnp.inf)
    dmax = jnp.max(dmasked, axis=1, keepdims=True)
    dmin = jnp.min(jnp.where(valid, cand_d, jnp.inf), axis=1, keepdims=True)
    span = jnp.maximum(dmax - dmin, eps)
    sim = jnp.maximum((dmax - cand_d) / span, 0.0) + eps
    inv_sqrt_eta = 1.0 / np.sqrt(eta) if eta > 0.0 else 1.0
    alpha = (sim ** power) * jnp.float32(inv_sqrt_eta)
    r = jnp.where(valid[:, :, None], cand_vecs.astype(jnp.float32)
                  * alpha[:, :, None], 0.0)
    norms = jnp.sum(r * r, axis=-1)                              # [B, C]
    rows = jnp.arange(b)

    def step(t, carry):
        r, norms, avail, selected = carry
        masked = jnp.where(avail, norms, -jnp.inf)
        piv = jnp.argmax(masked, axis=1)                          # [B]
        has = jnp.take_along_axis(masked, piv[:, None], 1)[:, 0] > -jnp.inf
        selected = selected.at[:, t].set(
            jnp.where(has, piv, -1).astype(jnp.int32)
        )
        avail = jax.vmap(
            lambda a, p, h: a.at[jnp.where(h, p, c)].set(False, mode="drop")
        )(avail, piv, has)
        rstar = jnp.take_along_axis(r, piv[:, None, None], 1)[:, 0]  # [B, d]
        bn = jnp.take_along_axis(norms, piv[:, None], 1)[:, 0]
        inv = jnp.where(bn > 0.0, 1.0 / bn, 0.0)  # zero pivot: skip deflation
        proj = jnp.einsum("bcd,bd->bc", r, rstar) * inv[:, None]
        proj = jnp.where(avail, proj, 0.0)
        r = r - proj[:, :, None] * rstar[:, None, :]
        norms = jnp.maximum(norms - proj * proj * bn[:, None], 0.0)
        return r, norms, avail, selected

    selected0 = jnp.full((b, k), -1, jnp.int32)
    _, _, _, selected = jax.lax.fori_loop(
        0, min(k, c), step, (r, norms, valid, selected0)
    )
    return selected


def determinant_rerank(
    index,
    queries,
    k: int = 10,
    *,
    l_search: int | None = None,
    power: float = 1.0,
    eta: float = 0.0,
    mode: str = "full",
):
    """Diversity-promoting rerank: over-fetch L candidates, then apply the
    determinant-diversity post-processor on device.  Returns (dists, ids,
    stats) with ids in selection order (relevance-scaled diverse set)."""
    l = l_search or max(4 * k, index.config.l_build)
    d, ids, stats = index.search(queries, k=l, l_search=l, mode=mode)
    cap = index.state.capacity
    idsj = jnp.asarray(ids.astype(np.int32))
    valid = idsj >= 0
    vecs = index.state.vectors[jnp.clip(idsj, 0, cap - 1)].astype(jnp.float32)
    sel = determinant_diversity_device(
        vecs, jnp.asarray(d), valid, k, power=power, eta=eta
    )
    sel = np.asarray(sel)
    take = np.clip(sel, 0, ids.shape[1] - 1)
    out_i = np.where(sel >= 0, np.take_along_axis(ids, take, 1), -1)
    out_d = np.where(sel >= 0, np.take_along_axis(d, take, 1), np.inf)
    return out_d, out_i, stats


def search_diverse(
    index,
    queries,
    attrs,
    k: int = 10,
    *,
    max_per_attribute: int = 1,
    l_search: int | None = None,
    mode: str = "full",
    enforce: str = "traversal",
    beam_width: int | None = None,
):
    """Diversity-aware k-NN (`diverse_search.rs:104`).

    enforce="post": over-fetch L then apply the attribute quota as a
    post-process — cheap, but blind to quota-satisfying results beyond the
    plain top-L.
    enforce="traversal" (default, the reference's semantics): the
    navigation list itself carries a per-attribute quota of
    ``diverse_l = max_per_attribute * L / k`` (the DiversePriorityQueue
    local-queue capacity formula, `diverse_priority_queue.rs:99-107`), so
    over-represented attributes stop consuming list slots and the walk
    keeps exploring toward quota-satisfying results a plain top-L search
    would have evicted.  Both finish with the same quota-constrained top-k
    (`post_process`, `diverse_priority_queue.rs:109-139`).
    """
    l = l_search or max(4 * k, index.config.l_build)
    attrs = np.asarray(attrs)
    if enforce == "post":
        d, ids, stats = index.search(queries, k=l, l_search=l, mode=mode)
    elif enforce == "traversal":
        from diskann_tpu.graph.index import SearchStats, _filter_deleted
        from diskann_tpu.graph.search import beam_search_scored

        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        cap = index.state.capacity
        a_dev = jnp.asarray(attrs.astype(np.int32))
        if a_dev.shape[0] < cap:
            # points without an attribute never reach the result set; give
            # pad rows their own group so they can't starve real attributes
            a_dev = jnp.pad(a_dev, (0, cap - a_dev.shape[0]),
                            constant_values=-2)
        dl = max(1, (max_per_attribute * l) // max(k, 1))
        sdef, sdata, expand_r = index._scorer_for_mode(mode)
        res = beam_search_scored(
            sdef, sdata, index.state.adjacency, index._start(),
            jnp.asarray(q),
            l_search=l,
            beam_width=beam_width or index.config.beam_width,
            max_hops=index.config.max_hops,
            history_capacity=index.config.history_capacity(l),
            expand_r=expand_r,
            diverse_attrs=a_dev, diverse_l=dl,
        )
        d, idsj = _filter_deleted(res.dists, res.ids, index.state.valid, l)
        d, ids = np.asarray(d), np.asarray(idsj)
        stats = SearchStats(
            cmps=np.asarray(res.cmps), hops=np.asarray(res.hops),
            result_count=(ids >= 0).sum(axis=1),
        )
    else:
        raise ValueError(f"unknown enforce mode {enforce!r}")
    od, oi = diverse_topk(d, ids, attrs, k, max_per_attribute)
    return od, oi, stats
