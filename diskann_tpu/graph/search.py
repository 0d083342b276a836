"""Frontier-batched greedy beam search (the Vamana search loop).

Reference semantics: `DiskANNIndex::search_internal`
(`diskann/src/graph/index.rs:1933-2000`): keep a distance-sorted best-list of
size L; repeatedly expand the ``beam_width`` closest unexpanded nodes, score
their not-yet-scored neighbors, and merge; stop when every node in the
best-list has been expanded.

TPU re-design: the loop runs *frontier-synchronous across a whole query batch*
inside one `lax.while_loop`.  Per hop, for B queries at once:

  1. frontier select  — the W closest unexpanded entries of each sorted
     best-list (replaces the queue cursor, `neighbor/queue.rs:68`);
  2. adjacency gather — padded ``int32 [N, R_slack]`` rows for all B*W
     frontier nodes (replaces per-node pointer chasing);
  3. dedup            — sort-dedup within the hop + membership compares
     against the best-list and a per-query *scored-id ring buffer* (replaces
     the `scratch.visited` hash set, `graph/search/scratch.rs:31`);
  4. score            — pluggable `Scorer` (full precision = one ``[B, C] x
     [C, d]`` MXU contraction; PQ = ADC table lookups), the accessor
     boundary of the reference (`glue.rs:210` expand_beam);
  5. merge            — ONE multi-operand XLA sort merges candidates into the
     best-lists.

Engineering constraints measured on the target (v5e via axon): each while
iteration carries a ~0.5ms scheduling floor and `scatter` costs ~10x a
similarly-shaped `sort`, while gathers stream at 40-90 GB/s.  The body is
therefore built from sorts, compares, gathers and *contiguous*
`dynamic_update_slice` ring writes — zero scatters — and wider beams
(W=2..8) trade per-hop width for fewer iterations.

The visited ring holds the last ``history_capacity/C`` hops of scored ids
(plus the start points).  Candidates already in the best-list are always
filtered exactly; a node that was scored, fell off the list, *and* aged out
of the ring may be re-scored — wasted work but identical results.  Size the
ring generously (or set ``history_capacity`` to cover all hops) for exact
reference `cmps` parity; tests do.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from diskann_tpu.graph.scorers import ScorerDef, full_precision_scorer
from diskann_tpu.ops.distance import Metric
from diskann_tpu.ops.topk import grouped_ranks, mask_duplicates_sorted

# Ids are int32; -1 marks an empty/padded slot, INT32_MAX is used as a
# sort-to-the-end sentinel during intra-hop dedup.
_SENTINEL = jnp.int32(2**31 - 1)


def _beta_bias(d, accepted, beta: float):
    """Bias navigation distances toward filter matches (FILTER_BETA,
    `defaults.rs:41`).  Positive distances shrink by *beta; negative
    (inner-product) distances grow in magnitude by /beta."""
    if beta == 1.0:
        return d
    biased = jnp.where(d >= 0, d * beta, d / beta)
    return jnp.where(accepted, biased, d)


class SearchState(NamedTuple):
    best_d: jax.Array      # [B, L] f32, ascending
    best_i: jax.Array      # [B, L] i32, -1 pad
    best_exp: jax.Array    # [B, L] i32 0/1 "has been expanded"
    ring: jax.Array        # [B, H] i32 scored-id ring buffer
    pool_d: jax.Array      # [B, P] f32 expanded-node pool (build only; P=1 stub otherwise)
    pool_i: jax.Array      # [B, P] i32
    pool_n: jax.Array      # [B] i32
    match_d: jax.Array     # [B, Lm] f32 filter-matching results (filtered search)
    match_i: jax.Array     # [B, Lm] i32
    cmps: jax.Array        # [B] i32 distance computations (reference `SearchStats.cmps`)
    hops: jax.Array        # [B] i32 nodes expanded (reference counts beam nodes)


class SearchResult(NamedTuple):
    dists: jax.Array       # [B, L] f32 ascending
    ids: jax.Array         # [B, L] i32 (-1 pad)
    cmps: jax.Array        # [B] i32
    hops: jax.Array        # [B] i32
    pool_d: jax.Array      # [B, P] expanded pool distances (build)
    pool_i: jax.Array      # [B, P]
    pool_n: jax.Array      # [B]
    match_d: jax.Array     # [B, Lm] filter-matching results (true distances)
    match_i: jax.Array     # [B, Lm]


class ResumeState(NamedTuple):
    """Persistable search scratch (the reference's `SearchScratch`,
    `graph/search/scratch.rs:31`): pass back via ``resume_state`` to continue
    a search — the substrate of resumable paged search (`paged.rs:27-53`)."""

    best_d: jax.Array      # [B, L]
    best_i: jax.Array      # [B, L]
    best_exp: jax.Array    # [B, L]
    ring: jax.Array        # [B, H]
    cmps: jax.Array        # [B]
    hops: jax.Array        # [B]
    match_d: jax.Array     # [B, Lm] filtered-search matched list ([B,1] dummy)
    match_i: jax.Array     # [B, Lm]


def _match_merge(md, mi, lm):
    """Merge candidate (d, id) columns into the matched-only list with ID
    DEDUP: the same id always carries a bitwise-identical true distance
    (same scorer, same inputs), so sorting by (d, id) lands duplicates
    adjacent where one shifted compare drops them.  Without this, an
    accepted node that fell off the nav list (dedup='list' re-scoring, or
    a ring reseed) would re-enter the match list as a duplicate result."""
    b = md.shape[0]
    md, mi = jax.lax.sort((md, mi), dimension=-1, num_keys=2)
    prev = jnp.concatenate([jnp.full((b, 1), -2, jnp.int32), mi[:, :-1]], axis=1)
    dup = (mi == prev) & (mi >= 0)
    md = jnp.where(dup, jnp.inf, md)
    mi = jnp.where(dup, -1, mi)
    md, mi = jax.lax.sort((md, mi), dimension=-1, num_keys=1)
    return md[:, :lm], mi[:, :lm]


def search_geometry(*, l_search: int, reserve: int, beam_width: int, r: int,
                    s: int, expand_r: int | None = None,
                    history_capacity: int = 0, dedup: str = "ring"):
    """Static scratch shapes for a `beam_search_scored` call:
    (total list width L, candidates/hop C, ring width H).  Exposed so
    resume callers can pre-pad a ResumeState to a new configuration
    (see `grow_resume_state`)."""
    l = l_search + reserve
    c = beam_width * (expand_r if expand_r is not None else r)
    want_h = history_capacity if history_capacity > 0 else max(2048, 6 * l)
    ring_hops = max(2, -(-max(want_h - s, c) // c))
    if dedup in ("list", "merge"):
        ring_hops = 1  # minimal stub; the in_ring compare is skipped
    return l, c, s + ring_hops * c


def grow_resume_state(st: ResumeState, l_total: int,
                      ring_width: int) -> ResumeState:
    """Pad a ResumeState's scratch to a LARGER list/ring width so the
    search can resume with a bigger L window (AdaptiveL re-search,
    `inline_filter_search.rs:63-75`) instead of restarting: already-
    expanded nodes stay expanded, the matched list carries over, and only
    the incremental frontier is walked.  New slots are empty
    (inf / -1 / expanded=1, appended at the sorted tail); the ring pads
    with -1 (segment positions don't matter — membership compares scan
    the full ring)."""
    b, l_old = st.best_d.shape
    dl = l_total - l_old
    dh = ring_width - st.ring.shape[1]
    assert dl >= 0 and dh >= 0, "resume states only grow"
    if dl == 0 and dh == 0:
        return st
    pad = lambda a, n, v: jnp.pad(  # noqa: E731
        a, ((0, 0), (0, n)), constant_values=v
    )
    has_match = st.match_d.shape[1] == l_old  # filtered search: Lm == L
    return ResumeState(
        best_d=pad(st.best_d, dl, jnp.inf),
        best_i=pad(st.best_i, dl, -1),
        best_exp=pad(st.best_exp, dl, 1),
        ring=pad(st.ring, dh, -1),
        cmps=st.cmps,
        hops=st.hops,
        match_d=pad(st.match_d, dl, jnp.inf) if has_match else st.match_d,
        match_i=pad(st.match_i, dl, -1) if has_match else st.match_i,
    )


@partial(
    jax.jit,
    static_argnames=(
        "scorer_def",
        "l_search",
        "beam_width",
        "max_hops",
        "history_capacity",
        "pool_capacity",
        "record_pool",
        "dedup",
        "accept_fn",
        "filter_beta",
        "filter_mode",
        "expand_r",
        "return_state",
        "reserve",
        "reseed_ring",
        "unroll",
        "diverse_l",
        "merge_trunc",
    ),
)
def beam_search_scored(
    scorer_def: ScorerDef,
    scorer_data,
    adjacency: jax.Array,      # [N, R] i32, -1 padded
    start_ids: jax.Array,      # [S] i32
    queries: jax.Array,        # [B, d]
    *,
    l_search: int,
    beam_width: int = 1,
    max_hops: int = 512,
    history_capacity: int = 0,
    pool_capacity: int = 1,
    record_pool: bool = False,
    dedup: str = "ring",
    accept_fn=None,            # static: (accept_data, ids, valid) -> bool mask
    accept_data=None,
    filter_beta: float = 1.0,
    filter_mode: str = "inline",   # "inline" | "multihop"
    query_valid: jax.Array | None = None,  # [B] bool — padded query rows
    expand_r: int | None = None,   # scorer.expand slots/node if != adjacency R
    resume_state: ResumeState | None = None,  # continue a prior search
    return_state: bool = False,    # also return the final ResumeState
    reserve: int = 0,  # extra list slots beyond the active L window
    reseed_ring: bool = False,  # resume: re-seed frontier from the ring
    unroll: bool = False,  # statically unroll the hop loop (small max_hops)
    diverse_attrs: jax.Array | None = None,  # [cap] i32 attribute per point
    diverse_l: int = 0,        # per-attribute quota in the navigation list
    merge_trunc: bool = False,  # pre-top_k candidates to l before the merge
) -> SearchResult:
    """Batched greedy beam search with a pluggable distance scorer.

    dedup="ring": scored-id ring buffer + best-list membership (exact up to
    ring age — reference `scratch.visited` semantics).
    dedup="list": best-list membership only — nodes that fell off the list
    may be re-scored (extra cmps, identical results); saves the [B, C, H]
    compare, the right trade when C is wide (W>=4) and codes are compact.
    dedup="merge": like "list" but duplicates are eliminated INSIDE the
    merge sort — the same id always carries a bitwise-identical distance
    (same formula, same inputs), so sorting by (d, id) lands duplicates
    adjacent where one shifted compare marks them.  Skips the [B, C, L]
    membership broadcast and the candidate id-sort entirely; requires a
    scorer with `expand` (distances for all candidates) and no filter."""
    b = queries.shape[0]
    n = adjacency.shape[0]
    r = adjacency.shape[1]
    s = start_ids.shape[-1]
    w = beam_width
    # `reserve` extra slots ride along in the sorted list but sit OUTSIDE
    # the active window: frontier selection and termination only consider
    # the first l_search entries (the reference's auto-resizable queue +
    # cursor-over-L, `neighbor/queue.rs:174-193` — the substrate that lets
    # paged search drain results and keep streaming)
    l, c, h = search_geometry(
        l_search=l_search, reserve=reserve, beam_width=w, r=r, s=s,
        expand_r=expand_r, history_capacity=history_capacity, dedup=dedup,
    )
    l_act = l_search
    # ring: one segment for start ids + ring_hops segments of C scored ids
    ring_hops = (h - s) // c
    if dedup == "merge":
        assert scorer_def.expand is not None and accept_fn is None, (
            "dedup='merge' needs an expand scorer and no filter"
        )
    p = pool_capacity if record_pool else 1

    q_ctx = scorer_def.prep(scorer_data, queries)

    # ---- init: score start points (reference `start_point_distances`) ----
    # start_ids: [S] shared across the batch, or [B, S] per-query (router)
    if start_ids.ndim == 1:
        sid = jnp.broadcast_to(start_ids[None, :], (b, s)).astype(jnp.int32)
    else:
        sid = start_ids.astype(jnp.int32)
    svalid = sid >= 0
    sd = scorer_def.score(scorer_data, q_ctx, sid, svalid)

    lm = l if accept_fn is not None else 1
    if accept_fn is not None:
        # inline filter search keeps a separate matched-only result list
        # (`inline_filter_search.rs:178` matched_results) and biases the
        # NAVIGATION distances of matching nodes by beta (FILTER_BETA=0.5).
        sacc = accept_fn(accept_data, sid, svalid)
        mpad = max(l - s, 0)
        match_d = jnp.pad(
            jnp.where(sacc, sd, jnp.inf), ((0, 0), (0, mpad)),
            constant_values=jnp.inf,
        )
        match_i = jnp.pad(
            jnp.where(sacc, sid, -1), ((0, 0), (0, mpad)), constant_values=-1
        )
        # start ids may repeat (router starts can hit the global start)
        match_d, match_i = _match_merge(match_d, match_i, lm)
        sd = _beta_bias(sd, sacc, filter_beta)
    else:
        match_d = jnp.full((b, lm), jnp.inf, jnp.float32)
        match_i = jnp.full((b, lm), -1, jnp.int32)

    pad = max(l - s, 0)
    init_d = jnp.pad(sd, ((0, 0), (0, pad)), constant_values=jnp.inf)
    init_i = jnp.pad(sid, ((0, 0), (0, pad)), constant_values=-1)
    init_d, init_i = jax.lax.sort((init_d, init_i), dimension=-1, num_keys=1)
    init_d, init_i = init_d[:, :l], init_i[:, :l]
    init_exp = jnp.where(init_i >= 0, 0, 1).astype(jnp.int32)

    ring = jnp.full((b, h), -1, dtype=jnp.int32)
    ring = ring.at[:, :s].set(jnp.where(svalid, sid, -1))

    if query_valid is not None:
        # converged-from-the-start rows: mark everything expanded
        init_exp = jnp.where(query_valid[:, None], init_exp, 1)

    if resume_state is not None:
        # continue from a prior search's scratch (paged.rs resume semantics);
        # the ring must keep its width for the compiled shapes to line up
        assert resume_state.ring.shape[1] == h, (
            "resume with identical l_search/beam_width/history settings"
        )
        init_d = resume_state.best_d
        init_i = resume_state.best_i
        init_exp = resume_state.best_exp
        ring = resume_state.ring
        if accept_fn is not None and resume_state.match_d.shape[1] == lm:
            # adaptive-L resume: the matched-only list carries over (start
            # points are already in it — do NOT re-seed, that would dup them)
            match_d = resume_state.match_d
            match_i = resume_state.match_i
        if reseed_ring:
            # A CONVERGED prior pass has every list entry expanded, so a
            # grown window alone gives no new frontier.  The scored-id ring
            # holds every id the prior pass scored — including the ones that
            # fell off its (smaller) list, which are exactly the candidates
            # the wider window would have kept.  Re-score them and merge as
            # UNEXPANDED entries (AdaptiveL resume; the reference re-searches
            # from scratch instead, `inline_filter_search.rs:63-75`).
            rid = jax.lax.sort(
                jnp.where(ring >= 0, ring, _SENTINEL), dimension=-1
            )
            rdup = mask_duplicates_sorted(rid)
            r_in_list = jnp.any(
                rid[:, :, None] == init_i[:, None, :], axis=-1
            )
            rfresh = (rid != _SENTINEL) & ~rdup & ~r_in_list
            rd = scorer_def.score(scorer_data, q_ctx, rid, rfresh)
            rids = jnp.where(rfresh, rid, -1)
            reseed_cmps = rfresh.astype(jnp.int32).sum(axis=1)
            if accept_fn is not None:
                racc = accept_fn(accept_data, rid, rfresh) & rfresh
                match_d, match_i = _match_merge(
                    jnp.concatenate(
                        [match_d, jnp.where(racc, rd, jnp.inf)], axis=1
                    ),
                    jnp.concatenate(
                        [match_i, jnp.where(racc, rids, -1)], axis=1
                    ),
                    lm,
                )
                if filter_mode == "multihop":
                    # multihop navigation admits accepted nodes only
                    rd = jnp.where(racc, rd, jnp.inf)
                    rids = jnp.where(racc, rids, -1)
                else:
                    rd = _beta_bias(rd, racc, filter_beta)
            md = jnp.concatenate([init_d, rd], axis=1)
            mi = jnp.concatenate([init_i, rids], axis=1)
            me = jnp.concatenate(
                [init_exp, jnp.where(rids >= 0, 0, 1).astype(jnp.int32)],
                axis=1,
            )
            md, mi, me = jax.lax.sort((md, mi, me), dimension=-1, num_keys=1)
            init_d, init_i, init_exp = md[:, :l], mi[:, :l], me[:, :l]

    state = SearchState(
        best_d=init_d,
        best_i=init_i,
        best_exp=init_exp,
        ring=ring,
        pool_d=jnp.full((b, p), jnp.inf, jnp.float32),
        pool_i=jnp.full((b, p), -1, jnp.int32),
        pool_n=jnp.zeros((b,), jnp.int32),
        match_d=match_d,
        match_i=match_i,
        cmps=svalid.astype(jnp.int32).sum(axis=1)
        if resume_state is None
        else (resume_state.cmps + reseed_cmps if reseed_ring
              else resume_state.cmps),
        hops=jnp.zeros((b,), jnp.int32)
        if resume_state is None else resume_state.hops,
    )

    # ---- in-traversal diversity quota (reference DiversePriorityQueue,
    # `diskann/src/neighbor/diverse_priority_queue.rs`: per-attribute local
    # queues of capacity diverse_l bound how many same-attribute candidates
    # the navigation list may hold, so the walk keeps exploring toward
    # quota-satisfying results a plain top-L would have evicted).  The
    # batched equivalent: after every list merge, evict entries whose
    # within-attribute distance-rank >= diverse_l — BEFORE truncating to L,
    # so the slots they'd waste go to other attributes instead.
    use_quota = diverse_attrs is not None and diverse_l > 0
    if use_quota:
        acap = diverse_attrs.shape[0]

        def _quota_evict(md, key):
            """md/key: [B, M] distance-sorted packed list (key = id*2|exp,
            -1 invalid).  Returns the re-sorted quota-enforced pair."""
            kid = key >> 1
            a = jnp.where(
                kid >= 0, diverse_attrs[jnp.clip(kid, 0, acap - 1)], -1
            )
            rank = grouped_ranks(a)
            evict = (kid >= 0) & (rank >= diverse_l)
            md = jnp.where(evict, jnp.inf, md)
            key = jnp.where(evict, jnp.int32(-1), key)
            return jax.lax.sort((md, key), dimension=-1, num_keys=1)

        k0 = jnp.where(init_i >= 0, init_i * 2 + init_exp, -1)
        d0, k0 = _quota_evict(init_d, k0)
        init_d, init_i = d0, k0 >> 1
        init_exp = (k0 & 1).astype(jnp.int32)
        state = state._replace(
            best_d=init_d, best_i=init_i, best_exp=init_exp
        )

    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (b, l), 1)

    active = pos_iota < l_act  # frontier/termination window (see `reserve`)

    def cond(carry):
        it, st = carry
        unexp = (st.best_exp == 0) & (st.best_i >= 0) & active
        return (it < max_hops) & jnp.any(unexp)

    def body(carry):
        it, st = carry
        # ---- 1. frontier selection: W closest unexpanded per row ----
        unexp = (st.best_exp == 0) & (st.best_i >= 0) & active
        rank = jnp.cumsum(unexp.astype(jnp.int32), axis=1) - 1
        sel = unexp & (rank < w)
        # compact selected positions left with one small sort
        sel_pos = jax.lax.sort(jnp.where(sel, pos_iota, l), dimension=-1)[:, :w]
        beam_valid = sel_pos < l
        safe_pos = jnp.minimum(sel_pos, l - 1)
        beam_ids = jnp.take_along_axis(st.best_i, safe_pos, axis=1)
        beam_d = jnp.take_along_axis(st.best_d, safe_pos, axis=1)
        beam_ids = jnp.where(beam_valid, beam_ids, -1)
        best_exp = jnp.where(sel, 1, st.best_exp)

        # ---- record expanded pool (insert path prune candidates) ----
        # contiguous stride-W writes; holes (converged rows) stay -1/inf
        if record_pool:
            off = jnp.minimum(it * w, p - w)
            overflow = (it * w + w) > p
            pd = jax.lax.dynamic_update_slice(
                st.pool_d, jnp.where(beam_valid, beam_d, jnp.inf), (0, off)
            )
            pi = jax.lax.dynamic_update_slice(
                st.pool_i, jnp.where(beam_valid, beam_ids, -1), (0, off)
            )
            pool_d = jnp.where(overflow, st.pool_d, pd)
            pool_i = jnp.where(overflow, st.pool_i, pi)
            pool_n = st.pool_n + beam_valid.astype(jnp.int32).sum(axis=1)
        else:
            pool_d, pool_i, pool_n = st.pool_d, st.pool_i, st.pool_n

        # ---- merge-dedup fast path: dedup inside the merge sort ----
        if dedup == "merge":
            ci, cd = scorer_def.expand(
                scorer_data, q_ctx, beam_ids, beam_valid
            )                                       # ci -1 / cd inf = invalid
            # sort by (d, id, is_new): a duplicated id carries a bitwise-
            # identical distance, so its copies land adjacent (old first).
            # The (id, is_new, expanded) triple rides ONE i32 word
            # (id*4 | is_new*2 | expanded) so the multi-operand sorts move
            # 2 operands instead of 4 — sort cost scales with operand
            # bytes, and these merges dominate the non-DMA hop time.
            # (-1 ids pack to -1 and unpack to (-1, 1, 1) — sign-safe.)
            md = jnp.concatenate([st.best_d, cd], axis=1)
            key = jnp.concatenate(
                [st.best_i * 4 + best_exp,
                 ci * 4 + 2],                       # fresh: is_new=1, exp=0
                axis=1,
            )
            md, key = jax.lax.sort((md, key), dimension=-1, num_keys=2)
            mi = key >> 2
            prev = jnp.concatenate(
                [jnp.full((b, 1), -2, jnp.int32), mi[:, :-1]], axis=1
            )
            dup = (mi == prev) & (mi >= 0)
            fresh_n = (
                ((key & 2) == 2) & ~dup & (mi >= 0)
            ).astype(jnp.int32).sum(axis=1)
            md = jnp.where(dup, jnp.inf, md)
            # re-pack (id, expanded) for the truncation sort; dups -> -1/1
            key2 = jnp.where(dup, jnp.int32(-1), mi * 2 + (key & 1))
            md, key2 = jax.lax.sort((md, key2), dimension=-1, num_keys=1)
            if use_quota:
                md, key2 = _quota_evict(md, key2)
            mi = key2 >> 1
            me = key2 & 1
            new_st = SearchState(
                best_d=md[:, :l],
                best_i=mi[:, :l],
                best_exp=me[:, :l],
                ring=st.ring,
                pool_d=pool_d,
                pool_i=pool_i,
                pool_n=pool_n,
                match_d=st.match_d,
                match_i=st.match_i,
                cmps=st.cmps + fresh_n,
                hops=st.hops + beam_valid.astype(jnp.int32).sum(axis=1),
            )
            return it + 1, new_st

        # ---- 2+4. expand beam: adjacency gather + scoring ----
        if scorer_def.expand is not None:
            # packed layout: one big row gather per beam node scores every
            # neighbor in the same pass (dists for dups are discarded below)
            cand, cand_d = scorer_def.expand(
                scorer_data, q_ctx, beam_ids, beam_valid
            )
            cand = jnp.where(cand >= 0, cand, _SENTINEL)
            cand, cand_d = jax.lax.sort((cand, cand_d), dimension=-1, num_keys=1)
        else:
            nbrs = adjacency[jnp.clip(beam_ids, 0, n - 1)]        # [B, W, R]
            nbrs = jnp.where(beam_valid[:, :, None], nbrs, -1)
            cand = nbrs.reshape(b, c)
            cand = jnp.where(cand >= 0, cand, _SENTINEL)
            cand = jax.lax.sort(cand, dimension=-1)
            cand_d = None

        # ---- 3. dedup: intra-hop sort-dedup + best-list + ring compares ----
        dup = mask_duplicates_sorted(cand)
        in_list = jnp.any(cand[:, :, None] == st.best_i[:, None, :], axis=-1)
        fresh = (cand != _SENTINEL) & ~dup & ~in_list              # [B, C]
        if dedup == "ring":
            in_ring = jnp.any(cand[:, :, None] == st.ring[:, None, :], axis=-1)
            fresh = fresh & ~in_ring
            # ring write: contiguous segment for this hop (no scatter)
            seg = s + (jnp.mod(it, ring_hops)) * c
            ring = jax.lax.dynamic_update_slice(
                st.ring, jnp.where(fresh, cand, -1), (0, seg)
            )
        else:
            ring = st.ring

        # ---- 4. score fresh candidates (scorer = accessor boundary) ----
        if cand_d is None:
            cd = scorer_def.score(scorer_data, q_ctx, cand, fresh)
        else:
            cd = jnp.where(fresh, cand_d, jnp.inf)
        cand_ids = jnp.where(fresh, cand, -1)

        # ---- 4b. filter: matched-results list + beta navigation bias ----
        extra = ()
        if accept_fn is not None:
            acc = accept_fn(accept_data, cand, fresh) & fresh
            match_d, match_i = _match_merge(
                jnp.concatenate(
                    [st.match_d, jnp.where(acc, cd, jnp.inf)], axis=1
                ),
                jnp.concatenate(
                    [st.match_i, jnp.where(acc, cand_ids, -1)], axis=1
                ),
                lm,
            )
            if filter_mode == "multihop":
                # MultihopFilterSearch (`multihop_filter_search.rs:180-237`):
                # only ACCEPTED nodes enter the navigation list; the closest
                # R_slack/2 rejected one-hop neighbors get a second,
                # accept-only expansion ("tunneling" through non-matches).
                w2 = max(r // 2, 1)
                rej_d = jnp.where(fresh & ~acc, cd, jnp.inf)
                rd2, ri2 = jax.lax.sort((rej_d, cand), dimension=-1, num_keys=1)
                hop2_ids = jnp.where(
                    jnp.isfinite(rd2[:, :w2]), ri2[:, :w2], -1
                )
                nb2 = adjacency[jnp.clip(hop2_ids, 0, n - 1)]
                nb2 = jnp.where((hop2_ids >= 0)[:, :, None], nb2, -1)
                cand2 = jnp.where(nb2 >= 0, nb2, _SENTINEL).reshape(b, w2 * r)
                cand2 = jax.lax.sort(cand2, dimension=-1)
                dup2 = mask_duplicates_sorted(cand2)
                in_list2 = jnp.any(
                    cand2[:, :, None] == st.best_i[:, None, :], axis=-1
                )
                in_hop1 = jnp.any(cand2[:, :, None] == cand[:, None, :], axis=-1)
                fresh2 = (cand2 != _SENTINEL) & ~dup2 & ~in_list2 & ~in_hop1
                cd2 = scorer_def.score(scorer_data, q_ctx, cand2, fresh2)
                acc2 = accept_fn(accept_data, cand2, fresh2) & fresh2
                ci2 = jnp.where(acc2, cand2, -1)
                cd2m = jnp.where(acc2, cd2, jnp.inf)
                extra = (cd2m, ci2)
                # matched list gets the two-hop accepts too
                match_d, match_i = _match_merge(
                    jnp.concatenate([match_d, cd2m], axis=1),
                    jnp.concatenate([match_i, ci2], axis=1),
                    lm,
                )
                # navigation list only takes accepted one-hop candidates
                cd = jnp.where(acc, cd, jnp.inf)
                cand_ids = jnp.where(acc, cand_ids, -1)
            else:
                cd = _beta_bias(cd, acc, filter_beta)
        else:
            match_d, match_i = st.match_d, st.match_i

        # ---- 4c. pre-truncate candidates to the list width (merge_trunc) ----
        # At most l candidates can enter the l-deep best list, so merging
        # more than the l CLOSEST candidates is pure sort width: top_k here
        # shrinks the merge sort from l+C to 2l operand columns (C = W*R =
        # 256 vs l ~ 24-40 at the production operating point, where these
        # merges are the largest non-DMA term).  Exact up to equal-distance
        # tie order; cmps/match/ring all read the full candidate set above.
        if merge_trunc and not extra and c > l:
            negd, ti = jax.lax.top_k(-cd, l)
            cd = -negd
            cand_ids = jnp.take_along_axis(cand_ids, ti, axis=1)

        # ---- 5. merge into best lists: one multi-operand sort ----
        # (id, expanded) ride ONE i32 word (id*2 | exp) so the merge moves
        # 2 sort operands instead of 3 — sort cost scales with operand
        # bytes and these merges dominate the non-DMA hop time.  Fresh
        # candidates enter unexpanded; -1 pads pack to -1 (= id -1, exp 1).
        md = jnp.concatenate([st.best_d, cd] + ([extra[0]] if extra else []), axis=1)
        key_parts = [
            st.best_i * 2 + best_exp,
            jnp.where(cand_ids >= 0, cand_ids * 2, -1),
        ]
        if extra:
            key_parts.append(jnp.where(extra[1] >= 0, extra[1] * 2, -1))
        key = jnp.concatenate(key_parts, axis=1)
        md, key = jax.lax.sort((md, key), dimension=-1, num_keys=1)
        if use_quota:
            md, key = _quota_evict(md, key)

        new_st = SearchState(
            best_d=md[:, :l],
            best_i=key[:, :l] >> 1,
            best_exp=(key[:, :l] & 1).astype(jnp.int32),
            ring=ring,
            pool_d=pool_d,
            pool_i=pool_i,
            pool_n=pool_n,
            match_d=match_d,
            match_i=match_i,
            cmps=st.cmps + fresh.astype(jnp.int32).sum(axis=1)
            + (fresh2.astype(jnp.int32).sum(axis=1) if extra else 0),
            hops=st.hops + beam_valid.astype(jnp.int32).sum(axis=1)
            + ((hop2_ids >= 0).astype(jnp.int32).sum(axis=1) if extra else 0),
        )
        return it + 1, new_st

    if unroll:
        # Static unroll: each lax loop ITERATION carries a ~0.5ms scheduling
        # floor on the target (CLAUDE.md perf model), so at the production
        # operating point (max_hops=6) the loop control alone costs ~3ms per
        # dispatch.  Unrolling compiles max_hops body instances back-to-back
        # with zero loop overhead.  Semantics are identical to running the
        # while_loop to its cap: converged rows select no frontier
        # (beam_valid=False) and every downstream op masks on it.  The loop
        # counter is a Python int, so ring-segment offsets become static.
        st = state
        for i in range(max_hops):
            _, st = body((i, st))
    else:
        _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), state))

    out = SearchResult(
        dists=st.best_d,
        ids=st.best_i,
        cmps=st.cmps,
        hops=st.hops,
        pool_d=st.pool_d,
        pool_i=st.pool_i,
        pool_n=st.pool_n,
        match_d=st.match_d,
        match_i=st.match_i,
    )
    if return_state:
        return out, ResumeState(
            best_d=st.best_d, best_i=st.best_i, best_exp=st.best_exp,
            ring=st.ring, cmps=st.cmps, hops=st.hops,
            match_d=st.match_d, match_i=st.match_i,
        )
    return out


def beam_search(
    vectors: jax.Array,        # [N, d]
    vec_sq_norms: jax.Array,   # [N]
    adjacency: jax.Array,      # [N, R] i32, -1 padded
    start_ids: jax.Array,      # [S] i32
    queries: jax.Array,        # [B, d]
    *,
    metric: Metric,
    l_search: int,
    beam_width: int = 1,
    max_hops: int = 512,
    history_capacity: int = 0,
    pool_capacity: int = 1,
    record_pool: bool = False,
    dedup: str = "ring",
    query_valid: jax.Array | None = None,
) -> SearchResult:
    """Full-precision beam search (the in-memory provider configuration)."""
    sdef, sdata = full_precision_scorer(vectors, vec_sq_norms, metric)
    return beam_search_scored(
        sdef, sdata, adjacency, start_ids, queries,
        l_search=l_search,
        beam_width=beam_width,
        max_hops=max_hops,
        history_capacity=history_capacity,
        pool_capacity=pool_capacity,
        record_pool=record_pool,
        dedup=dedup,
        query_valid=query_valid,
    )
