"""Slow, obviously-correct scalar implementations used as test oracles.

These play the role the `Emulated` SIMD backend and the "pedantic" DashMap
test provider play in the reference (`diskann-wide/src/arch/emulated`,
`diskann/src/graph/test/provider.rs`): independent implementations of the
same semantics, written directly from the algorithm description.
"""

from __future__ import annotations

import numpy as np


def dist(a, b, metric="l2"):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if metric == "l2":
        return float(((a - b) ** 2).sum())
    if metric == "ip":
        return float(-(a * b).sum())
    raise ValueError(metric)


def occlude_list(
    point,
    pool_ids,
    pool_dists,
    vectors,
    *,
    degree,
    alpha,
    metric="l2",
    self_id=None,
):
    """Scalar alpha-occlusion prune following the documented semantics of
    `occlude_list` (`diskann/src/graph/index.rs:2565-2777`):

    pool sorted ascending; alpha ladder 1.0 -> alpha (x min(alpha,1.2));
    in-order scan; promoted neighbors occlude only later candidates;
    occlusion factors accumulate across rungs."""
    order = np.argsort(pool_dists, kind="stable")
    ids = [pool_ids[i] for i in order]
    ds = [pool_dists[i] for i in order]
    c = len(ids)

    occ = np.zeros(c)
    for i in range(c):
        if ids[i] < 0 or (self_id is not None and ids[i] == self_id):
            occ[i] = np.inf
    # drop duplicate ids (keep closest occurrence)
    seen = set()
    for i in range(c):
        if occ[i] == np.inf:
            continue
        if ids[i] in seen:
            occ[i] = np.inf
        else:
            seen.add(ids[i])

    selected = []  # pool positions in promotion order
    cur_alpha = 1.0
    inc = min(alpha, 1.2)
    while True:
        for i in range(c):
            if len(selected) >= degree:
                break
            if occ[i] > cur_alpha or i in selected:
                continue
            # promote i; occlude later candidates
            selected.append(i)
            occ[i] = np.inf
            vi = vectors[ids[i]]
            for k in range(i + 1, c):
                if occ[k] == np.inf:
                    continue
                djk = dist(vi, vectors[ids[k]], metric)
                if metric == "l2":
                    occ[k] = max(occ[k], np.inf if djk == 0 else ds[k] / djk)
                else:  # occluding rule
                    if djk < cur_alpha * ds[k]:
                        occ[k] = cur_alpha + 0.01
        if len(selected) >= degree or cur_alpha >= alpha:
            break
        cur_alpha = min(cur_alpha * inc, alpha) if inc > 1.0 else alpha

    return [ids[i] for i in selected]


def greedy_filter_search(vectors, adjacency, start, query, l, accept,
                         beta=0.5, metric="l2"):
    """Scalar inline beta-filter search (InlineFilterSearch semantics,
    `diskann-label-filter/src/inline_beta_search/*`, FILTER_BETA
    `defaults.rs:41`), beam_width=1:

    - navigation list of size l holds ALL scored nodes, with ACCEPTED
      nodes' distances biased toward the query (positive d -> d*beta,
      negative d -> d/beta, computed in f32 to match the device);
    - a separate matched-only list of size l holds accepted nodes at
      their TRUE distances;
    - expansion/termination identical to plain greedy search.

    Returns (matched ids ascending by true distance, nav ids, n_cmps)."""
    f32 = np.float32
    scored = {}

    def d(i):
        if i not in scored:
            scored[i] = dist(query, vectors[i], metric)
        return scored[i]

    def bias(td, acc):
        if not acc or beta == 1.0:
            return td
        t = f32(td)
        return float(t * f32(beta)) if td >= 0 else float(t / f32(beta))

    cmps = 0
    nav, match = [], []
    for s in sorted(set(start)):
        td = d(s)
        cmps += 1
        acc = bool(accept(s))
        nav.append((bias(td, acc), s))
        if acc:
            match.append((td, s))
    nav = sorted(nav)[:l]
    match = sorted(match)[:l]
    expanded = set()
    while True:
        cur = next((i for _, i in nav if i not in expanded), None)
        if cur is None:
            break
        expanded.add(cur)
        new = []
        for nb in adjacency[cur]:
            nb = int(nb)
            if nb < 0 or nb in scored:
                continue
            td = d(nb)
            cmps += 1
            acc = bool(accept(nb))
            new.append((bias(td, acc), nb))
            if acc:
                match.append((td, nb))
        nav = sorted(nav + new)[:l]
        match = sorted(match)[:l]
    return [i for _, i in match], [i for _, i in nav], cmps


def greedy_search(vectors, adjacency, start, query, l, metric="l2"):
    """Scalar best-first search with an L-sized sorted list (search_internal
    semantics, beam_width=1). Returns (ids sorted by distance, n_cmps)."""
    scored = {}

    def d(i):
        if i not in scored:
            scored[i] = dist(query, vectors[i], metric)
        return scored[i]

    best = sorted((d(s), s) for s in set(start))[:l]
    expanded = set()
    cmps = len(best)
    while True:
        cur = None
        for _, i in best:
            if i not in expanded:
                cur = i
                break
        if cur is None:
            break
        expanded.add(cur)
        new = []
        for nb in adjacency[cur]:
            nb = int(nb)
            if nb < 0 or nb in scored:
                continue
            new.append((d(nb), nb))
            cmps += 1
        best = sorted(best + new)[:l]
    return [i for _, i in best], cmps
