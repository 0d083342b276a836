"""Additional search modes: range, paged, diversity-aware top-k.

References:
- Range search: `diskann/src/graph/search/range_search.rs` — two-round
  radius search: a k-NN pass sized L, doubled while the result boundary
  still lies inside the radius.
- Paged search: `diskann/src/graph/search/paged.rs:27-53` — pagination over
  one logical result stream.  The reference resumes the scratch across
  calls; here each page re-runs the (stateless, batched) search with a
  larger L and slices the new window — same results, functional state.
- Diverse search: `diskann/src/graph/search/diverse_search.rs:104` — top-k
  constrained to at most `max_per_attribute` results sharing an attribute
  value, greedily in distance order.
"""

from __future__ import annotations

import numpy as np


def range_search(
    index,
    queries,
    radius: float,
    *,
    l_init: int | None = None,
    l_max: int = 1024,
    mode: str = "full",
) -> list[np.ndarray]:
    """All ids within `radius` of each query (reference `Range::search`
    two-round scheme). Returns a list of id arrays (variable length)."""
    queries = np.asarray(queries, np.float32)
    if queries.ndim == 1:
        queries = queries[None]
    b = queries.shape[0]
    l = l_init or max(32, index.config.l_build)
    done = np.zeros(b, bool)
    results: list[np.ndarray] = [np.empty(0, np.int64)] * b
    while True:
        d, ids, _ = index.search(queries, k=l, l_search=l, mode=mode)
        for i in range(b):
            if done[i]:
                continue
            inside = (ids[i] >= 0) & (d[i] <= radius)
            results[i] = ids[i][inside].astype(np.int64)
            # boundary found if the furthest retrieved point is outside the
            # radius (or the list isn't full) — else L was too small
            full = (ids[i] >= 0).all()
            done[i] = (not full) or (d[i][-1] > radius)
        if done.all() or l >= l_max:
            break
        l = min(2 * l, l_max)
    return results


class PagedSearch:
    """Resumable pagination over one query's result stream
    (`PagedSearch::next_page`)."""

    def __init__(self, index, query, *, page_l_slack: int = 16, mode: str = "full"):
        self.index = index
        self.query = np.asarray(query, np.float32).reshape(1, -1)
        self.returned = 0
        self.slack = page_l_slack
        self.mode = mode
        self.exhausted = False

    def next_page(self, k: int):
        if self.exhausted:
            return np.empty(0, np.float32), np.empty(0, np.int64)
        want = self.returned + k
        l = want + self.slack
        d, ids, _ = self.index.search(
            self.query, k=want, l_search=l, mode=self.mode
        )
        page_d = d[0][self.returned : want]
        page_i = ids[0][self.returned : want]
        live = page_i >= 0
        if not live.all():
            self.exhausted = True
        self.returned = want
        return page_d[live], page_i[live].astype(np.int64)


def diverse_topk(
    dists: np.ndarray,     # [B, L] ascending
    ids: np.ndarray,       # [B, L]
    attrs: np.ndarray,     # [cap] attribute value per point
    k: int,
    max_per_attribute: int,
):
    """Greedy diversity-constrained top-k (DiverseSearch semantics): walk the
    sorted candidates, skip entries whose attribute quota is exhausted."""
    b, l = ids.shape
    out_d = np.full((b, k), np.inf, np.float32)
    out_i = np.full((b, k), -1, np.int64)
    for row in range(b):
        counts: dict = {}
        n = 0
        for j in range(l):
            pid = int(ids[row, j])
            if pid < 0 or n >= k:
                break
            a = attrs[pid]
            c = counts.get(a, 0)
            if c >= max_per_attribute:
                continue
            counts[a] = c + 1
            out_d[row, n] = dists[row, j]
            out_i[row, n] = pid
            n += 1
    return out_d, out_i


def search_diverse(
    index,
    queries,
    attrs,
    k: int = 10,
    *,
    max_per_attribute: int = 1,
    l_search: int | None = None,
    mode: str = "full",
):
    """Diversity-aware k-NN: over-fetch then apply the attribute quota."""
    l = l_search or max(4 * k, index.config.l_build)
    d, ids, stats = index.search(queries, k=l, l_search=l, mode=mode)
    od, oi = diverse_topk(d, ids, np.asarray(attrs), k, max_per_attribute)
    return od, oi, stats
