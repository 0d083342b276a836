"""Frontier-batched greedy beam search (the Vamana search loop).

Reference semantics: `DiskANNIndex::search_internal`
(`diskann/src/graph/index.rs:1933-2000`): keep a distance-sorted best-list of
size L; repeatedly expand the ``beam_width`` closest unexpanded nodes, score
their not-yet-scored neighbors, and merge; stop when every node in the
best-list has been expanded.

TPU re-design: the loop runs *frontier-synchronous across a whole query batch*.
Per hop, for B queries at once:

  1. frontier select  — the W closest unexpanded entries of each sorted
     best-list (replaces the queue cursor, `neighbor/queue.rs:68`);
  2. adjacency gather — padded ``int32 [N, R_slack]`` rows for all B*W
     frontier nodes (replaces per-node pointer chasing);
  3. dedup            — one broadcasted equality against a bounded per-query
     visited buffer (replaces the `scratch.visited` hash set,
     `graph/search/scratch.rs:31`) plus a sort-based intra-hop dedup;
  4. score            — pluggable `Scorer` (full precision = one ``[B, C] x
     [C, d]`` MXU contraction; PQ = ADC table lookups), the accessor
     boundary of the reference (`glue.rs:210` expand_beam);
  5. merge            — one multi-operand XLA sort merges candidates into the
     best-lists.

Everything is static-shape; convergence is handled by per-row masks inside a
``lax.while_loop`` whose condition is "any query still has unexpanded work",
mirroring `has_notvisited_node()`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from diskann_tpu.graph.scorers import ScorerDef, full_precision_scorer
from diskann_tpu.ops.distance import Metric
from diskann_tpu.ops.topk import mask_duplicates_sorted

# Ids are int32; -1 marks an empty/padded slot, INT32_MAX is used as a
# sort-to-the-end sentinel during intra-hop dedup.
_SENTINEL = jnp.int32(2**31 - 1)


class SearchState(NamedTuple):
    best_d: jax.Array      # [B, L] f32, ascending
    best_i: jax.Array      # [B, L] i32, -1 pad
    best_exp: jax.Array    # [B, L] i32 0/1 "has been expanded"
    hist: jax.Array        # [B, H] i32 scored-id dedup buffer
    hist_n: jax.Array      # [B] i32
    pool_d: jax.Array      # [B, P] f32 expanded-node pool (build only; P=1 stub otherwise)
    pool_i: jax.Array      # [B, P] i32
    pool_n: jax.Array      # [B] i32
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


def _append_rows(buf: jax.Array, n: jax.Array, vals: jax.Array, valid: jax.Array):
    """Append `vals[b, j]` where `valid[b, j]` to each row of `buf` starting at
    offset `n[b]`.  Out-of-capacity writes are dropped. Returns (buf, new_n)."""
    h = buf.shape[1]
    offs = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1 + n[:, None]
    offs = jnp.where(valid, offs, h)  # drop invalid and overflow
    buf = jax.vmap(lambda row, o, v: row.at[o].set(v, mode="drop"))(buf, offs, vals)
    new_n = jnp.minimum(n + valid.astype(jnp.int32).sum(axis=1), h)
    return buf, new_n


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
    query_valid: jax.Array | None = None,  # [B] bool — padded query rows
) -> SearchResult:
    """Batched greedy beam search with a pluggable distance scorer."""
    b = queries.shape[0]
    n = adjacency.shape[0]
    r = adjacency.shape[1]
    s = start_ids.shape[0]
    w = beam_width
    l = l_search
    h = history_capacity if history_capacity > 0 else max(256, 4 * l + 2 * r)
    p = pool_capacity if record_pool else 1

    q_ctx = scorer_def.prep(scorer_data, queries)

    # ---- init: score start points (reference `start_point_distances`) ----
    sid = jnp.broadcast_to(start_ids[None, :], (b, s)).astype(jnp.int32)
    svalid = sid >= 0
    sd = scorer_def.score(scorer_data, q_ctx, sid, svalid)

    pad = max(l - s, 0)
    init_d = jnp.pad(sd, ((0, 0), (0, pad)), constant_values=jnp.inf)
    init_i = jnp.pad(sid, ((0, 0), (0, pad)), constant_values=-1)
    init_d, init_i = jax.lax.sort((init_d, init_i), dimension=-1, num_keys=1)
    init_d, init_i = init_d[:, :l], init_i[:, :l]
    init_exp = jnp.where(init_i >= 0, 0, 1).astype(jnp.int32)

    hist = jnp.full((b, h), -1, dtype=jnp.int32)
    hist, hist_n = _append_rows(hist, jnp.zeros((b,), jnp.int32), sid, svalid)

    if query_valid is not None:
        # converged-from-the-start rows: mark everything expanded
        init_exp = jnp.where(query_valid[:, None], init_exp, 1)

    state = SearchState(
        best_d=init_d,
        best_i=init_i,
        best_exp=init_exp,
        hist=hist,
        hist_n=hist_n,
        pool_d=jnp.full((b, p), jnp.inf, jnp.float32),
        pool_i=jnp.full((b, p), -1, jnp.int32),
        pool_n=jnp.zeros((b,), jnp.int32),
        cmps=svalid.astype(jnp.int32).sum(axis=1),
        hops=jnp.zeros((b,), jnp.int32),
    )

    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (b, l), 1)

    def cond(carry):
        it, st = carry
        unexp = (st.best_exp == 0) & (st.best_i >= 0)
        return (it < max_hops) & jnp.any(unexp)

    def body(carry):
        it, st = carry
        # ---- 1. frontier selection: W closest unexpanded per row ----
        unexp = (st.best_exp == 0) & (st.best_i >= 0)
        rank = jnp.cumsum(unexp.astype(jnp.int32), axis=1) - 1
        sel = unexp & (rank < w)
        # compact selected positions to the left: sort (pos or L) ascending
        sel_pos = jnp.where(sel, pos_iota, l)
        sel_pos = jax.lax.sort(sel_pos, dimension=-1)[:, :w]      # [B, W]
        beam_valid = sel_pos < l
        safe_pos = jnp.minimum(sel_pos, l - 1)
        beam_ids = jnp.take_along_axis(st.best_i, safe_pos, axis=1)
        beam_d = jnp.take_along_axis(st.best_d, safe_pos, axis=1)
        beam_ids = jnp.where(beam_valid, beam_ids, -1)
        best_exp = jnp.where(sel, 1, st.best_exp)

        # ---- record expanded pool (insert path prune candidates) ----
        if record_pool:
            pool_d, pool_i = st.pool_d, st.pool_i
            pool_i, _ = _append_rows(pool_i, st.pool_n, beam_ids, beam_valid)
            pool_d, pool_n = _append_rows(pool_d, st.pool_n, beam_d, beam_valid)
        else:
            pool_d, pool_i, pool_n = st.pool_d, st.pool_i, st.pool_n

        # ---- 2. adjacency gather ----
        nbrs = adjacency[jnp.clip(beam_ids, 0, n - 1)]            # [B, W, R]
        nbrs = jnp.where(beam_valid[:, :, None], nbrs, -1)
        cand = nbrs.reshape(b, w * r)

        # ---- 3. dedup: intra-hop (sort) + against history ----
        cand = jnp.where(cand >= 0, cand, _SENTINEL)
        cand = jax.lax.sort(cand, dimension=-1)
        dup = mask_duplicates_sorted(cand)
        visited = jnp.any(cand[:, :, None] == st.hist[:, None, :], axis=-1)
        fresh = (cand != _SENTINEL) & ~dup & ~visited             # [B, W*R]

        hist, hist_n = _append_rows(st.hist, st.hist_n, cand, fresh)

        # ---- 4. score fresh candidates (scorer = accessor boundary) ----
        cd = scorer_def.score(scorer_data, q_ctx, cand, fresh)
        cand_ids = jnp.where(fresh, cand, -1)

        # ---- 5. merge into best lists ----
        md = jnp.concatenate([st.best_d, cd], axis=1)
        mi = jnp.concatenate([st.best_i, cand_ids], axis=1)
        # fresh candidates enter unexpanded (0); padded ones never selected (1)
        me = jnp.concatenate(
            [best_exp, jnp.where(cand_ids >= 0, 0, 1).astype(jnp.int32)], axis=1
        )
        md, mi, me = jax.lax.sort((md, mi, me), dimension=-1, num_keys=1)

        new_st = SearchState(
            best_d=md[:, :l],
            best_i=mi[:, :l],
            best_exp=me[:, :l],
            hist=hist,
            hist_n=hist_n,
            pool_d=pool_d,
            pool_i=pool_i,
            pool_n=pool_n,
            cmps=st.cmps + fresh.astype(jnp.int32).sum(axis=1),
            hops=st.hops + beam_valid.astype(jnp.int32).sum(axis=1),
        )
        return it + 1, new_st

    _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), state))

    return SearchResult(
        dists=st.best_d,
        ids=st.best_i,
        cmps=st.cmps,
        hops=st.hops,
        pool_d=st.pool_d,
        pool_i=st.pool_i,
        pool_n=st.pool_n,
    )


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
        query_valid=query_valid,
    )
