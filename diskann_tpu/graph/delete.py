"""Streaming deletes: IP-DiskANN in-place delete + Fresh-DiskANN consolidation.

Reference: `DiskANNIndex::inplace_delete` (`diskann/src/graph/index.rs:1527`,
arXiv:2502.13826) — for each deleted node: find its in-neighbors, patch their
adjacency lists (remove the deleted id, add replacement candidates drawn from
the deleted node's own out-neighbors), RobustPrune any overfull list, then
drop the deleted node's row (`drop_adj_list`, index.rs:1060).  Background
cleanup (`drop_deleted_neighbors` / `consolidate_vector`, index.rs:1756,1819)
sweeps remaining dangling references.

TPU re-design: deletion state is a liveness bitmap; in-neighbor discovery is
batched gathers over the deleted nodes' neighborhoods instead of per-node
reverse maps; affected rows are patched as one batched remove+union+prune
kernel.  All three reference replacement policies (`InplaceDeleteMethod`,
`graph/misc.rs:27-32`, `index.rs:1100-1337`) are implemented:

- ``one_hop``: in-neighbors approximated by the deleted node's out-list;
  replacement candidates are the out-lists of the dead entries in each row.
- ``two_hop_one_hop`` (the streaming harness default, `diskann-benchmark-
  core/src/streaming/graph/inplace_delete.rs:113`): in-neighbors from the
  two-hop neighborhood; replacements as in one_hop.
- ``visited_topk`` (`VisitedAndTopK{k,l}`): a beam search seeded with each
  deleted vector finds its approximate top-L undeleted neighbors; those are
  both the in-neighbor candidates and (truncated to k) the replacements.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from diskann_tpu.graph.build import chunked_robust_prune
from diskann_tpu.graph.config import GraphConfig
from diskann_tpu.graph.state import GraphArrays
from diskann_tpu.ops.distance import pairwise_distance


@jax.jit
def mark_deleted(state: GraphArrays, ids: jax.Array) -> GraphArrays:
    """Soft-delete: clear liveness + update the medoid running sum.
    (`Delete::delete`, `diskann/src/provider.rs:158` soft path.)"""
    cap = state.capacity
    safe = jnp.clip(ids, 0, cap - 1)
    was_valid = state.valid[safe] & (ids >= 0)
    removed = jnp.where(
        was_valid[:, None], state.vectors[safe].astype(jnp.float32), 0.0
    ).sum(axis=0)
    return state._replace(
        valid=state.valid.at[jnp.where(ids >= 0, ids, cap)].set(False, mode="drop"),
        vec_sum=state.vec_sum - removed,
    )


@jax.jit
def rows_referencing_deleted(state: GraphArrays) -> jax.Array:
    """[cap] bool — rows whose adjacency list contains a deleted id."""
    cap = state.capacity
    entries = state.adjacency
    dead = (~state.valid[jnp.clip(entries, 0, cap - 1)]) & (entries >= 0)
    return dead.any(axis=1) & state.valid


def _kept_and_repl(state, rows, max_dead, repl_lookup, repl_table,
                   repl_cap: int = 0):
    """Shared patch front-end: live kept entries + replacement candidates
    for up to ``max_dead`` deleted entries per row (from the dead entries'
    out-lists, or from the visited_topk ``repl_table``).

    repl_cap > 0 truncates each dead entry's out-list to its first
    ``repl_cap`` entries (RobustPrune selection order = the dead node's
    best-ranked neighbors).  The repair candidate gather is row-issue-bound
    (~12ns/row), so the pool width directly prices the patch dispatch:
    C = Rs + max_dead*Rs ~ 480 costs ~5.5s/cycle of pure gather at the 1M
    streaming bench's 960k affected rows; repl_cap=16 cuts it 3x."""
    cap = state.capacity
    a = rows.shape[0]
    row_ok = (rows >= 0) & (rows < cap)
    safe_rows = jnp.clip(rows, 0, cap - 1)
    adj = state.adjacency[safe_rows]                              # [A, Rs]
    live = state.valid[jnp.clip(adj, 0, cap - 1)] & (adj >= 0)
    kept = jnp.where(live, adj, -1)

    # up to max_dead deleted entries per row, compacted by rank scatter
    deadm = (~state.valid[jnp.clip(adj, 0, cap - 1)]) & (adj >= 0)
    drank = jnp.cumsum(deadm.astype(jnp.int32), axis=1) - 1
    dslot = jnp.where(deadm & (drank < max_dead), drank, max_dead)
    dead_ids = jnp.full((a, max_dead), -1, jnp.int32)
    dead_ids = jax.vmap(lambda o, p, v: o.at[p].set(v, mode="drop"))(
        dead_ids, dslot, adj
    )
    if repl_table is not None:
        # replacement candidates: the dead entry's precomputed top-k
        # undeleted neighbors (VisitedAndTopK, index.rs:1167-1237)
        tr = repl_lookup[jnp.clip(dead_ids, 0, cap)]              # [A, md]
        repl = repl_table[jnp.clip(tr, 0, repl_table.shape[0] - 1)]
        repl = jnp.where(
            ((dead_ids >= 0) & (tr >= 0))[:, :, None], repl, -1
        ).reshape(a, -1)
    else:
        # replacement candidates: out-lists of the dead entries (OneHop)
        repl = state.adjacency[jnp.clip(dead_ids, 0, cap - 1)]    # [A, md, Rs]
        if repl_cap and repl_cap < repl.shape[2]:
            repl = repl[:, :, :repl_cap]
        repl = jnp.where((dead_ids >= 0)[:, :, None], repl, -1).reshape(a, -1)
    repl_live = state.valid[jnp.clip(repl, 0, cap - 1)] & (repl >= 0)
    # a replacement must not be the row itself
    repl = jnp.where(repl_live & (repl != rows[:, None]), repl, -1)
    return row_ok, safe_rows, kept, repl


@partial(jax.jit, static_argnames=("config", "max_dead", "prune_chunk"))
def patch_rows(
    state: GraphArrays,
    rows: jax.Array,          # [A] i32 row ids to patch (cap = padding)
    config: GraphConfig,
    *,
    max_dead: int = 4,
    prune_chunk: int = 0,
    repl_lookup: jax.Array | None = None,  # [cap+1] i32: dead id -> table row
    repl_table: jax.Array | None = None,   # [D, K] i32 replacement candidates
) -> GraphArrays:
    """Patch rows that reference deleted nodes (one batched repair).

    For each row: keep live entries; pull replacement candidates for up to
    ``max_dead`` deleted entries — from each dead entry's out-list (the
    one_hop/two_hop policies) or from ``repl_table`` (the visited_topk
    policy); RobustPrune the union back to R if it exceeds the slack
    capacity, else keep the union directly (matching
    `inplace_delete_inner`'s patch-then-maybe-prune, index.rs:1558)."""
    cap = state.capacity
    r_slack = state.max_degree_slack
    r = config.max_degree
    a = rows.shape[0]
    row_ok, safe_rows, kept, repl = _kept_and_repl(
        state, rows, max_dead, repl_lookup, repl_table
    )

    pool_ids = jnp.concatenate([kept, repl], axis=1)              # [A, C]
    p_vec = state.vectors[safe_rows]
    pv = state.vectors[jnp.clip(pool_ids, 0, cap - 1)]
    pool_d = pairwise_distance(p_vec[:, None, :], pv, config.metric)[:, 0, :]
    pool_d = jnp.where(pool_ids >= 0, pool_d, jnp.inf)

    new_ids, _, new_n = chunked_robust_prune(
        state.vectors, p_vec, pool_ids, pool_d,
        jnp.where(row_ok, rows, -1), config,
        degree=r, chunk=prune_chunk,
    )
    new_rows = jnp.pad(new_ids, ((0, 0), (0, r_slack - r)), constant_values=-1)

    w = jnp.where(row_ok, rows, cap)
    adjacency = state.adjacency.at[w].set(new_rows, mode="drop")
    degrees = state.degrees.at[w].set(new_n, mode="drop")
    return state._replace(adjacency=adjacency, degrees=degrees)


@partial(jax.jit, static_argnames=("config", "max_dead", "repl_cap"))
def fill_rows(
    state: GraphArrays,
    rows: jax.Array,          # [A] i32 row ids to patch (cap = padding)
    config: GraphConfig,
    *,
    max_dead: int = 4,
    repl_lookup: jax.Array | None = None,
    repl_table: jax.Array | None = None,
    repl_cap: int = 16,
) -> GraphArrays:
    """Prune-free patch: drop dead entries, top-up with the NEAREST
    replacement candidates until the slack capacity.

    This is the reference's actual fast path: ``inplace_delete_inner``
    splices replacement candidates into the in-neighbor's list and runs
    RobustPrune only when the list exceeds its slack capacity
    (index.rs:1558) — rows legitimately live at R*slack between prunes, and
    the next insert's backedge overflow re-tightens them.  ``patch_rows``
    prunes every row to R, which costs a ~2R-iteration occlusion
    lax-loop per dispatch (~0.5ms/iteration fixed floor — the reason
    scan-repair measured 931 deletes/s at the 1M streaming bench, r04).
    Here the occlusion scan is replaced by two row-wise sorts:
    dedup by (id, kept-before-replacement), then rank kept entries first
    and replacements by distance."""
    cap = state.capacity
    r_slack = state.max_degree_slack
    a = rows.shape[0]
    row_ok, safe_rows, kept, repl = _kept_and_repl(
        state, rows, max_dead, repl_lookup, repl_table, repl_cap
    )

    pool_ids = jnp.concatenate([kept, repl], axis=1)              # [A, C]
    p_vec = state.vectors[safe_rows]
    pv = state.vectors[jnp.clip(pool_ids, 0, cap - 1)]
    pool_d = pairwise_distance(p_vec[:, None, :], pv, config.metric)[:, 0, :]
    pool_d = jnp.where(pool_ids >= 0, pool_d, jnp.inf).astype(jnp.float32)

    # dedup: lexicographic sort by (id, replacement-flag) — within an
    # equal-id run the kept entry sorts first and survives
    is_repl = (
        jnp.arange(pool_ids.shape[1], dtype=jnp.int32) >= kept.shape[1]
    )
    flag = jnp.broadcast_to(is_repl.astype(jnp.int32), pool_ids.shape)
    sid, sflag, sd = jax.lax.sort((pool_ids, flag, pool_d), num_keys=2)
    dup = jnp.concatenate(
        [jnp.zeros((a, 1), bool), sid[:, 1:] == sid[:, :-1]], axis=1
    )
    ok = (sid >= 0) & ~dup & jnp.isfinite(sd)
    # rank: every kept entry before any replacement (a patch must never
    # evict a live pruned edge), replacements by ascending distance
    key = jnp.where(ok, jnp.where(sflag == 0, sd - 1e30, sd), jnp.inf)
    key, oid = jax.lax.sort((key, sid), num_keys=1)
    new_ids = jnp.where(jnp.isfinite(key[:, :r_slack]), oid[:, :r_slack], -1)
    new_n = (new_ids >= 0).sum(axis=1).astype(state.degrees.dtype)

    w = jnp.where(row_ok, rows, cap)
    adjacency = state.adjacency.at[w].set(new_ids, mode="drop")
    degrees = state.degrees.at[w].set(new_n, mode="drop")
    return state._replace(adjacency=adjacency, degrees=degrees)


@jax.jit
def drop_deleted_rows(state: GraphArrays) -> GraphArrays:
    """Clear adjacency rows of deleted nodes (`drop_adj_list`, index.rs:1060)."""
    gone = ~state.valid
    return state._replace(
        adjacency=jnp.where(gone[:, None], -1, state.adjacency),
        degrees=jnp.where(gone, 0, state.degrees),
    )


def _pad_bucket(a: np.ndarray, bucket: int = 1 << 17) -> np.ndarray:
    """Pad a 1-D index array to the next ``bucket`` multiple with -1.

    Discovery gathers run at data-dependent sizes (the one/two-hop
    candidate sets vary per delete batch), and every distinct shape costs
    a fresh remote TPU compile (10-60s on the relay): the r05 streaming
    bench measured 219.8s/cycle of discovery vs 9.8s of actual repair,
    all of it per-cycle recompiles.  Bucketed shapes repeat across cycles
    so the compile cache absorbs them; callers slice results back to the
    true length after the fetch."""
    size = -(-max(len(a), 1) // bucket) * bucket
    return np.pad(a, (0, size - len(a)), constant_values=-1)


def _rows_that_reference_deleted(state: GraphArrays, rows_np: np.ndarray):
    """Filter candidate rows down to live rows whose adjacency contains a
    deleted id (`return_refs_to_deleted_vertex`, index.rs:1139-1163)."""
    if len(rows_np) == 0:
        return rows_np
    cap = state.capacity
    rows = jnp.asarray(_pad_bucket(rows_np.astype(np.int32)))
    safe = jnp.clip(rows, 0, cap - 1)
    adj = state.adjacency[safe]
    dead = (~state.valid[jnp.clip(adj, 0, cap - 1)]) & (adj >= 0)
    keep = dead.any(axis=1) & state.valid[safe]
    return rows_np[np.asarray(keep)[: len(rows_np)]]


def inplace_delete(
    index,                     # GraphIndex (facade)
    ids: np.ndarray,
    *,
    method: str = "scan",
    k_value: int = 16,
    l_value: int | None = None,
    patch_batch: int = 0,
    repair: str = "prune",
    max_dead: int = 4,
    repl_cap: int = 16,
) -> None:
    """Multi in-place delete (index.rs:1338 `multi_inplace_delete`): mark,
    find affected in-neighbor rows per ``method``, patch them in batches,
    drop deleted rows.

    method: "one_hop" | "two_hop_one_hop" | "visited_topk" | "scan"
    ("scan" patches EVERY row referencing a deleted id — a full-graph
    gather is one cheap vectorized pass on TPU, strictly a superset of the
    reference's approximations).

    repair: "prune" RobustPrunes every patched row back to R;
    "fill" (reference index.rs:1558 semantics) drops dead entries and
    tops rows up with nearest replacements to the slack capacity without
    an occlusion scan — ~5x cheaper per batch (no 2R-iteration lax loop);
    the next insert's backedge overflow re-prunes.

    patch_batch: rows per repair dispatch (0 = auto: 1024 for "prune",
    whose per-dispatch cost is the fixed ~2R-iteration occlusion loop;
    4096 for "fill", whose cost is the [rows, C, d] candidate gather —
    bigger batches amortize dispatch overhead until the gather transient
    (~1GB at 4096 x 480 x 128 f32) bounds them).

    max_dead: dead entries per row that contribute replacement candidates
    (all dead entries are always dropped).  At 5% batch churn with R=64
    the MEAN dead count per affected row is ~4.2, so the r04 default of 4
    silently starved half the rows of replacements — the r05 stream run
    measured recall_min 0.9356 with max_dead=4; 8 covers ~95% of rows.
    repl_cap: see `_kept_and_repl` (fill only)."""
    import os
    import time as _time

    prof = os.environ.get("DISKANN_DELETE_PROFILE") == "1"

    def _tick(label, t0):
        if prof:
            np.asarray(index.state.valid[:1])   # drain the device queue
            dt = _time.time() - t0
            print(f"[delete-prof] {label}: {dt:.2f}s", flush=True)
            return _time.time()
        return t0

    t0 = _time.time()
    ids = np.asarray(ids, np.int64)
    st = index.state
    cap = st.capacity
    if patch_batch <= 0:
        patch_batch = 4096 if repair == "fill" else 1024
    # the deleted nodes' out-lists, fetched before rows are dropped
    out_lists = np.asarray(
        st.adjacency[jnp.asarray(np.clip(ids, 0, cap - 1), jnp.int32)]
    )
    index.state = mark_deleted(index.state, jnp.asarray(ids, jnp.int32))

    repl_lookup = repl_table = None
    def _uniq(ids_arr):
        # membership mask instead of np.unique: unique sorts (O(E log E)
        # over up to ~100M two-hop entries, tens of seconds on this box);
        # random bool writes are ~10x cheaper and output sorted ids free
        m = np.zeros((cap,), bool)
        flat = ids_arr.ravel()
        m[flat[flat >= 0]] = True
        return np.nonzero(m)[0]

    if method == "scan":
        affected = np.nonzero(
            np.asarray(rows_referencing_deleted(index.state))
        )[0]
    elif method == "one_hop":
        cand = _uniq(out_lists)
        affected = _rows_that_reference_deleted(index.state, cand)
    elif method == "two_hop_one_hop":
        one_hop = _uniq(out_lists)
        if len(one_hop):
            oh = jnp.asarray(_pad_bucket(one_hop.astype(np.int32)))
            hop2 = np.asarray(
                index.state.adjacency[jnp.clip(oh, 0, cap - 1)]
            )[: len(one_hop)]
            m = np.zeros((cap,), bool)
            m[one_hop] = True
            flat = hop2.ravel()
            m[flat[flat >= 0]] = True
            cand = np.nonzero(m)[0]
        else:
            cand = one_hop
        affected = _rows_that_reference_deleted(index.state, cand)
    elif method == "visited_topk":
        # VisitedAndTopK{k,l} (index.rs:1167-1237): beam-search each deleted
        # vector; its top-L undeleted results approximate the in-neighbors
        # AND (truncated to k) the replacement candidates
        if getattr(index, "_hbm_vectors_dropped", False):
            raise ValueError("visited_topk needs full vectors in HBM")
        from diskann_tpu.graph.search import beam_search

        l = l_value or max(k_value, index.config.l_build)
        qv = index.state.vectors[
            jnp.asarray(np.clip(ids, 0, cap - 1), jnp.int32)
        ]
        res = beam_search(
            index.state.vectors, index.state.sq_norms,
            index.state.adjacency, index._start(), qv,
            metric=index.config.metric, l_search=l,
            beam_width=index.config.beam_width,
            max_hops=index.config.max_hops,
        )
        rid = res.ids
        ok = (rid >= 0) & index.state.valid[jnp.clip(rid, 0, cap - 1)]
        visited = jnp.where(ok, rid, -1)
        # compact live results left so [:k_value] is the true top-k
        rank = jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1
        packed_tbl = jnp.full(visited.shape, -1, jnp.int32)
        packed_tbl = jax.vmap(
            lambda o, p, v: o.at[jnp.where(p >= 0, p, visited.shape[1])].set(
                v, mode="drop"
            )
        )(packed_tbl, jnp.where(ok, rank, -1), rid)
        visited_np = np.asarray(packed_tbl)
        repl_table = jnp.asarray(visited_np[:, :k_value])
        repl_lookup = (
            jnp.full((cap + 1,), -1, jnp.int32)
            .at[jnp.asarray(np.clip(ids, 0, cap - 1), jnp.int32)]
            .set(jnp.arange(len(ids), dtype=jnp.int32))
        )
        cand = np.unique(visited_np[visited_np >= 0])
        affected = _rows_that_reference_deleted(index.state, cand)
    else:
        raise ValueError(f"unknown delete method {method!r}")
    t0 = _tick(f"mark+discovery ({method}, {len(affected)} rows)", t0)

    repair_fn = {"prune": patch_rows, "fill": fill_rows}[repair]
    repair_kw = dict(repl_lookup=repl_lookup, repl_table=repl_table,
                     max_dead=max_dead)
    if repair == "fill":
        repair_kw["repl_cap"] = repl_cap
    for off in range(0, len(affected), patch_batch):
        chunk = affected[off : off + patch_batch].astype(np.int32)
        pad = (-len(chunk)) % patch_batch
        if pad:
            chunk = np.pad(chunk, (0, pad), constant_values=-1)
        index.state = repair_fn(
            index.state, jnp.asarray(chunk), index.config, **repair_kw,
        )
    t0 = _tick(f"{repair} patches ({(len(affected)+patch_batch-1)//patch_batch if len(affected) else 0} dispatches)", t0)
    index.state = drop_deleted_rows(index.state)
    if index.packed is not None:
        # keep the packed layout consistent: patched rows changed their
        # neighborhoods, deleted rows were cleared
        from diskann_tpu.graph import packed as packed_mod

        stale = np.concatenate([affected.astype(np.int64), ids]).astype(np.int32)
        for off in range(0, len(stale), patch_batch):
            chunk = stale[off : off + patch_batch]
            pad = (-len(chunk)) % patch_batch
            if pad:
                chunk = np.pad(chunk, (0, pad), constant_values=-1)
            index.packed = packed_mod.refresh_rows_donated(
                index.packed, index.state.adjacency, jnp.asarray(chunk)
            )
        _tick(f"packed refresh ({len(stale)} rows)", t0)
    index.free_slots.extend(int(i) for i in ids)
    index.n_deleted += len(ids)
