"""Batched Vamana construction — the `multi_insert` path.

Reference: `DiskANNIndex::multi_insert` (`diskann/src/graph/index.rs:815-899`)
commits an insert batch in three phases (dev doc `index.rs:786-814`):

  1. *Set Elements* — write the batch's vectors;
  2. *Candidate Generation* — per item: greedy search, collect the expanded
     pool, add intra-batch candidates, RobustPrune to the out-neighbor list;
  3. *Graph Update* — commit out-edges, then aggregate backedges by target
     (`aggregate_backedges`, `index.rs:123-143`) and re-prune overfull rows
     (`add_edge_and_prune`, `index.rs:2264`).

TPU re-design: the whole batch moves through each phase as dense tensors —
phase 2 is one frontier-batched beam search plus one batched RobustPrune; the
phase-3 backedge aggregation becomes sort-by-target + segmented ranking +
one flat scatter, and the conflict-free "partition so tasks touch disjoint
nodes" requirement of the reference is satisfied by construction because the
scatter writes disjoint (target, slot) cells and overfull targets are
re-pruned as one batched prune over unique targets.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from diskann_tpu.graph.config import GraphConfig
from diskann_tpu.graph.prune import robust_prune
from diskann_tpu.graph.search import beam_search
from diskann_tpu.graph.state import GraphArrays, set_vectors
from diskann_tpu.ops.distance import Metric, pairwise_distance
from diskann_tpu.ops.topk import mask_duplicates_sorted

_SENT = jnp.int32(2**31 - 1)


def chunked_robust_prune(
    vectors: jax.Array,
    p_vecs: jax.Array,      # [M, d]
    cand_ids: jax.Array,    # [M, C]
    cand_d: jax.Array,      # [M, C]
    self_ids: jax.Array,    # [M]
    config: GraphConfig,
    *,
    degree: int,
    chunk: int = 0,
    mem_budget_bytes: int = 1 << 30,
):
    """RobustPrune M pools, chunked over rows only as far as the [chunk, C, d]
    candidate-vector gather demands.  Chunks are made as LARGE as the budget
    allows: every chunk pays the occlusion scan's ~2*degree loop iterations,
    and loop iterations carry a fixed scheduling cost on TPU — one wide scan
    beats many narrow ones."""
    m, c = cand_ids.shape
    d = vectors.shape[1]
    if chunk <= 0:
        per_row = c * d * vectors.dtype.itemsize * 2  # gather + sorted copy
        chunk = max(64, min(m, mem_budget_bytes // max(per_row, 1)))
    chunk = min(chunk, m)
    pad = (-m) % chunk
    if pad:
        p_vecs = jnp.pad(p_vecs, ((0, pad), (0, 0)))
        cand_ids = jnp.pad(cand_ids, ((0, pad), (0, 0)), constant_values=-1)
        if cand_d is not None:
            cand_d = jnp.pad(cand_d, ((0, pad), (0, 0)), constant_values=jnp.inf)
        self_ids = jnp.pad(self_ids, (0, pad), constant_values=-1)
        m += pad
    n = vectors.shape[0]
    with_d = cand_d is not None

    def one(args):
        if with_d:
            pv, ci, cd, si = args
        else:
            pv, ci, si = args
            cd = None
        cvec = vectors[jnp.clip(ci, 0, n - 1)]
        return robust_prune(pv, ci, cd, cvec, si, config, degree=degree)

    xs = (
        p_vecs.reshape(m // chunk, chunk, -1),
        cand_ids.reshape(m // chunk, chunk, c),
    )
    if with_d:
        xs = xs + (cand_d.reshape(m // chunk, chunk, c),)
    xs = xs + (self_ids.reshape(m // chunk, chunk),)
    res = jax.lax.map(one, xs)
    out = (
        res.ids.reshape(m, degree),
        res.dists.reshape(m, degree),
        res.count.reshape(m),
    )
    if pad:
        out = tuple(o[: m - pad] for o in out)
    return out


class InsertStats(NamedTuple):
    cmps: jax.Array
    hops: jax.Array


@partial(
    jax.jit,
    static_argnames=("config", "pool_capacity", "prune_chunk", "backedge_src_cap"),
    # donate the graph + packed state: without this every functional update
    # keeps a second copy of the multi-GB tables alive and OOMs the chip
    donate_argnums=(0, 6),
)
def insert_batch(
    state: GraphArrays,
    slot_ids,               # [M] i32 — target slots (contiguous for bulk build,
                            # freelist-recycled for streaming inserts)
    new_vecs: jax.Array,    # [M, d] f32
    row_valid: jax.Array,   # [M] bool — padding mask for ragged final batches
    start_ids: jax.Array,   # [S] i32
    config: GraphConfig,
    packed=None,            # PackedState | None — incremental packed layout
    *,
    pool_capacity: int = 512,
    prune_chunk: int = 0,
    backedge_src_cap: int = 64,
    router=None,            # (rc [S, dp] i8, raux [S] f32, rids [S] i32) | None
):
    """Insert a batch of M new points at ``slot_ids``.

    Returns (state, packed, stats).  When a `PackedState` is passed,
    candidate generation traverses the packed int8 layout (one row gather per
    expansion — the build-speed analogue of the reference disk build's
    PQ-guided search) and the packed tables are maintained incrementally as
    edges are committed; prune decisions are always full-precision (distances
    recomputed from the raw vectors inside RobustPrune)."""
    from diskann_tpu.graph import packed as packed_mod
    from diskann_tpu.graph.scorers import packed_scorer
    from diskann_tpu.graph.search import beam_search_scored

    m, d = new_vecs.shape
    r = config.max_degree
    r_slack = state.max_degree_slack
    cap = state.capacity
    metric = config.metric

    new_vecs = jnp.where(row_valid[:, None], new_vecs, 0.0)
    new_ids = jnp.where(row_valid, slot_ids, -1).astype(jnp.int32)

    # The pool records W beam nodes per hop, so a hop-capped candidate
    # search can never fill more than mh*W slots — right-size it (rounded
    # to the 128 f32 lane tile) instead of carrying the default width
    # through the phase-2 concat + occlusion-cap sort
    mh_eff = config.build_max_hops or config.max_hops
    pool_capacity = min(
        pool_capacity,
        max(-(-mh_eff * config.beam_width // 128) * 128, 128),
    )

    # ---------------- phase 1: set elements ----------------
    state = set_vectors(state, slot_ids, new_vecs, row_valid=row_valid)
    if packed is not None:
        codes, aux = packed_mod.encode(packed, new_vecs, metric)
        packed = packed_mod.set_self_codes(
            packed, jnp.where(row_valid, slot_ids, -1), codes, aux
        )

    # ---------------- phase 2: candidate generation ----------------
    if packed is not None and router is not None:
        # per-query router entry points (same strategy as production search:
        # one int8 MXU matmul vs a sampled live set) — candidate search
        # converges in ~10 hops instead of ~24 walking down from the medoid
        from diskann_tpu.graph.scorers import packed_router_starts

        rc, raux, rids = router
        # chunk the [M, S] distance matrix: at M=8192, S=32768 the full
        # i32 dots + f32 dists would hold ~2GB of HLO temps
        rq = max(1, m // 2048)
        rst = jnp.concatenate([
            packed_router_starts(
                rc, raux, rids, packed.proj, packed.pscale, packed.pbias2,
                new_vecs[i * (m // rq):(i + 1) * (m // rq)], metric,
                config.router_starts, exact=False,
            )
            for i in range(rq)
        ], axis=0)
        search_start = jnp.concatenate(
            [jnp.broadcast_to(start_ids[None, :], (m, start_ids.shape[0])),
             rst], axis=1,
        )
        search_start = jnp.where(row_valid[:, None], search_start, -1)
    else:
        search_start = start_ids
    if packed is not None:
        sdef, sdata = packed_scorer(packed, metric)
        res = beam_search_scored(
            sdef, sdata, state.adjacency, search_start, new_vecs,
            l_search=config.l_build,
            beam_width=config.beam_width,
            max_hops=config.build_max_hops or config.max_hops,
            pool_capacity=pool_capacity,
            record_pool=True,
            dedup="merge",
            query_valid=row_valid,
            expand_r=packed.r_pack,
        )
    else:
        res = beam_search(
            state.vectors, state.sq_norms, state.adjacency, start_ids,
            new_vecs.astype(state.vectors.dtype),
            metric=metric,
            l_search=config.l_build,
            beam_width=config.beam_width,
            max_hops=config.build_max_hops or config.max_hops,
            pool_capacity=pool_capacity,
            record_pool=True,
            query_valid=row_valid,
        )

    # intra-batch candidates (`IntraBatchCandidates::All`, config/mod.rs:120)
    ibc = config.intra_batch_candidates
    if ibc == "all" or (isinstance(ibc, int) and ibc > 0):
        ib_d = pairwise_distance(new_vecs, new_vecs, metric)     # [M, M]
        eye = jnp.eye(m, dtype=jnp.bool_)
        col_ok = row_valid[None, :] & ~eye
        if isinstance(ibc, int):
            # window of `ibc` position-wise neighbors centered on each item
            pos = jnp.arange(m)
            win = jnp.abs(pos[:, None] - pos[None, :]) <= (ibc // 2)
            col_ok = col_ok & win
        ib_d = jnp.where(col_ok, ib_d, jnp.inf)
        ib_ids = jnp.where(col_ok, new_ids[None, :], -1)
        if m > 2 * config.max_occlusion_size:
            # pre-select the occlusion cap's worth of intra-batch neighbors
            # with approx_min_k (TPU-native partial top-k): sorting the full
            # [M, M + pool] matrix costs ~seconds at M=8192 while only
            # max_occlusion entries can ever survive the cap below
            kk = min(config.max_occlusion_size, m)
            ib_d, ib_pos = jax.lax.approx_min_k(ib_d, kk)
            ib_ids = jnp.take_along_axis(ib_ids, ib_pos, axis=1)
        cand_ids = jnp.concatenate([res.pool_i, ib_ids], axis=1)
        cand_d = jnp.concatenate([res.pool_d, ib_d], axis=1)
    else:
        cand_ids, cand_d = res.pool_i, res.pool_d

    # drop DELETED nodes from the pool: the candidate search routes through
    # soft-deleted waypoints (correct), but a dead id pruned into the new
    # node's neighbor list is a dangling edge AND its row would take a
    # backedge write — found by the mutation-interleaving stress test as a
    # dead row resurrected with one live entry after delete->insert
    # (reference: deleted vertices are not insertion candidates,
    # index.rs:1527 in-neighbor semantics)
    pool_ok = (cand_ids >= 0) & state.valid[jnp.clip(cand_ids, 0, cap - 1)]
    cand_ids = jnp.where(pool_ok, cand_ids, -1)
    cand_d = jnp.where(pool_ok, cand_d, jnp.inf)

    # truncate pool to the occlusion cap by distance (`max_occlusion_size`)
    c_cap = min(cand_ids.shape[1], config.max_occlusion_size)
    cd_sorted, ci_sorted = jax.lax.sort((cand_d, cand_ids), dimension=-1, num_keys=1)
    cand_d, cand_ids = cd_sorted[:, :c_cap], ci_sorted[:, :c_cap]

    out_ids, _out_d, out_n = chunked_robust_prune(
        state.vectors, new_vecs.astype(state.vectors.dtype), cand_ids,
        None if packed is not None else cand_d,
        new_ids, config, degree=r, chunk=prune_chunk,
    )
    out_ids = jnp.where(row_valid[:, None], out_ids, -1)
    out_n = jnp.where(row_valid, out_n, 0)

    # ---------------- phase 3a: commit out-edges ----------------
    out_rows = jnp.pad(out_ids, ((0, 0), (0, r_slack - r)), constant_values=-1)
    w_ids = jnp.where(row_valid, slot_ids, cap)
    adjacency = state.adjacency.at[w_ids].set(out_rows, mode="drop")
    degrees = state.degrees.at[w_ids].set(out_n, mode="drop")
    state = state._replace(adjacency=adjacency, degrees=degrees)
    if packed is not None:
        packed = packed_mod.refresh_rows(packed, state.adjacency, w_ids)

    # ---------------- phase 3b: backedges ----------------
    if config.max_backedges is not None:
        be = min(config.max_backedges, r)
        tgt = out_ids[:, :be]
    else:
        tgt = out_ids
    src = jnp.broadcast_to(new_ids[:, None], tgt.shape)
    tgt = tgt.reshape(-1)
    src = src.reshape(-1)
    e = tgt.shape[0]
    # belt-and-suspenders: never append a backedge into a dead row (the
    # pool mask above should make this redundant)
    pair_ok = (tgt >= 0) & state.valid[jnp.clip(tgt, 0, cap - 1)]

    # skip sources already present in the target row (AdjacencyList dedup,
    # `diskann/src/graph/adjacencylist.rs:16`)
    trow = state.adjacency[jnp.clip(tgt, 0, cap - 1)]            # [E, R_slack]
    already = jnp.any(trow == src[:, None], axis=1)
    pair_ok = pair_ok & ~already

    tkey = jnp.where(pair_ok, tgt, _SENT)
    order = jnp.argsort(tkey)
    tkey_s = tkey[order]
    src_s = src[order]
    ok_s = pair_ok[order]

    iota_e = jnp.arange(e, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), jnp.bool_), tkey_s[1:] != tkey_s[:-1]])
    group_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, iota_e, 0)
    )
    csum = jnp.cumsum(ok_s.astype(jnp.int32))
    csum_before_group = jnp.where(group_start > 0, csum[jnp.maximum(group_start - 1, 0)], 0)
    rank = csum - 1 - csum_before_group                          # rank among ok in group

    deg_t = state.degrees[jnp.clip(tkey_s, 0, cap - 1)]
    slot = deg_t + rank
    append_ok = ok_s & (slot < r_slack) & (tkey_s != _SENT)

    flat_idx = jnp.where(
        append_ok, tkey_s * r_slack + slot, jnp.int32(cap * r_slack)
    )
    adj_flat = state.adjacency.reshape(-1)
    adj_flat = adj_flat.at[flat_idx].set(src_s, mode="drop")
    adjacency = adj_flat.reshape(cap, r_slack)
    degrees = state.degrees.at[jnp.where(append_ok, tkey_s, cap)].add(
        1, mode="drop"
    )
    state = state._replace(adjacency=adjacency, degrees=degrees)
    if packed is not None:
        # int32 word scatters, in place on the donated table
        packed = packed_mod.append_edges(packed, tkey_s, slot, src_s, append_ok)

    # ---------------- phase 3c: re-prune overfull targets ----------------
    # (`add_edge_and_prune`, index.rs:2264: when a row exceeds R*slack it is
    #  pruned back down to R)
    overflow = ok_s & (slot >= r_slack)
    # mark groups with any overflow via scatter-max onto the group-start slot
    group_has_of = (
        jnp.zeros((e,), jnp.int32).at[group_start].max(overflow.astype(jnp.int32)) > 0
    )
    sel_first = first & group_has_of & (tkey_s != _SENT)

    u_cap = min(m, e)
    pick = jnp.where(sel_first, iota_e, jnp.int32(e))
    pick = jax.lax.sort(pick)[:u_cap]                            # [U] group starts
    pick_ok = pick < e
    pick_c = jnp.minimum(pick, e - 1)
    t_u = jnp.where(pick_ok, tkey_s[pick_c], cap)                # target id (cap = drop)

    k_src = backedge_src_cap
    gpos = pick_c[:, None] + jnp.arange(k_src, dtype=jnp.int32)[None, :]
    gpos_c = jnp.minimum(gpos, e - 1)
    g_src = src_s[gpos_c]
    g_t = tkey_s[gpos_c]
    g_ok = (gpos < e) & (g_t == t_u[:, None]) & pick_ok[:, None] & ok_s[gpos_c]
    g_src = jnp.where(g_ok, g_src, -1)

    t_row = adjacency[jnp.clip(t_u, 0, cap - 1)]                 # [U, R_slack]
    pool_ids = jnp.concatenate([t_row, g_src], axis=1)           # [U, R_slack+K]
    t_vec = state.vectors[jnp.clip(t_u, 0, cap - 1)]
    # cand_dists=None: the prune recomputes d(t, pool) from the SAME pool
    # gather its occlusion scan needs anyway — precomputing here would pay
    # the row-issue-bound [U, P, d] vector gather twice (~70ns/row)
    rp_ids, _rp_d, rp_n = chunked_robust_prune(
        state.vectors, t_vec, pool_ids, None, t_u, config,
        degree=r, chunk=prune_chunk,
    )
    rp_rows = jnp.pad(rp_ids, ((0, 0), (0, r_slack - r)), constant_values=-1)

    write_t = jnp.where(pick_ok, t_u, cap)
    adjacency = adjacency.at[write_t].set(rp_rows, mode="drop")
    degrees = state.degrees.at[write_t].set(rp_n, mode="drop")
    state = state._replace(adjacency=adjacency, degrees=degrees)
    if packed is not None:
        packed = packed_mod.refresh_rows(packed, state.adjacency, write_t)

    stats = InsertStats(cmps=res.cmps, hops=res.hops)
    return state, packed, stats
