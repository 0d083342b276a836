"""Top-k and sorted-merge primitives.

These replace the reference's ``NeighborPriorityQueue`` (a sorted array with an
insertion cursor, `diskann/src/neighbor/queue.rs:68`) with batch-parallel sorted
arrays: the beam-search best-list for *every* query in a batch is kept as a
distance-sorted ``[B, L]`` triple (dists, ids, flags) and each hop merges the
new candidates with one multi-operand XLA sort.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Sentinel id for "empty slot" everywhere in the framework. Using -1 keeps
# padding checks cheap (`ids >= 0`) and XLA gathers are clamped/masked.
INVALID_ID = jnp.int32(-1)
INF = jnp.float32(jnp.inf)


@partial(jax.jit, static_argnames=("k",))
def topk_smallest(dists: jax.Array, ids: jax.Array, k: int):
    """Smallest-k by distance with ids carried along.

    dists: [..., N] f32, ids: [..., N] int32.  Returns ([..., k], [..., k])
    sorted ascending by distance.  A full multi-operand sort is used rather
    than ``jax.lax.top_k`` because it returns ascending order with carried
    ids in one pass and is competitive at beam-search list sizes on TPU.
    """
    sd, si = jax.lax.sort((dists, ids), dimension=-1, num_keys=1)
    return sd[..., :k], si[..., :k]


def merge_sorted(
    dists_a: jax.Array,
    ids_a: jax.Array,
    dists_b: jax.Array,
    ids_b: jax.Array,
    k: int,
    *extra_a_b,
):
    """Merge two per-row candidate lists, keep the k smallest, sorted.

    Shapes: [B, La] + [B, Lb] -> [B, k].  Any number of extra per-entry
    payload arrays may be passed as (pa, pb) pairs in ``extra_a_b`` and are
    carried through the sort.
    """
    d = jnp.concatenate([dists_a, dists_b], axis=-1)
    i = jnp.concatenate([ids_a, ids_b], axis=-1)
    payloads = []
    assert len(extra_a_b) % 2 == 0
    for j in range(0, len(extra_a_b), 2):
        payloads.append(jnp.concatenate([extra_a_b[j], extra_a_b[j + 1]], axis=-1))
    out = jax.lax.sort((d, i, *payloads), dimension=-1, num_keys=1)
    return tuple(o[..., :k] for o in out)


def merge_into_sorted(
    best_d: jax.Array,   # [B, L] ascending
    best_i: jax.Array,   # [B, L]
    best_e: jax.Array,   # [B, L] payload (expanded flags)
    cd: jax.Array,       # [B, C] unsorted new candidate distances (inf = drop)
    ci: jax.Array,       # [B, C] candidate ids
    ce: jax.Array,       # [B, C] candidate payload
):
    """Merge C unsorted candidates into a sorted best-list of length L
    WITHOUT a sort: every element's output position is computed with
    broadcasted comparisons (rank), then written with one scatter per array.

    Equivalent to a stable ascending sort of [best | candidates] truncated to
    L, but ~20x faster on TPU where `lax.sort` of a [B, 164] batch costs
    ~1ms while these rank compares + scatters cost tens of microseconds.
    Tie-breaks match stable-sort semantics: existing entries precede new
    candidates of equal distance; candidates preserve their relative order.
    """
    b, l = best_d.shape
    c = cd.shape[1]
    # candidate rank among candidates (strict less, index tiebreak)
    lt = (cd[:, :, None] > cd[:, None, :]) | (
        (cd[:, :, None] == cd[:, None, :])
        & (jax.lax.broadcasted_iota(jnp.int32, (b, c, c), 1)
           > jax.lax.broadcasted_iota(jnp.int32, (b, c, c), 2))
    )
    rank_cc = lt.sum(axis=2, dtype=jnp.int32)                    # [B, C]
    # candidates placed after equal-distance best entries
    rank_cb = (best_d[:, None, :] <= cd[:, :, None]).sum(axis=2, dtype=jnp.int32)
    pos_c = rank_cb + rank_cc                                    # [B, C]
    # best entries shift by the number of strictly-smaller candidates
    rank_bc = (cd[:, None, :] < best_d[:, :, None]).sum(axis=2, dtype=jnp.int32)
    pos_b = jax.lax.broadcasted_iota(jnp.int32, (b, l), 1) + rank_bc

    pos_b = jnp.where(pos_b < l, pos_b, l)                       # drop overflow
    pos_c = jnp.where(pos_c < l, pos_c, l)

    def scatter2(vb, vc, fill):
        out = jnp.full((b, l), fill, dtype=vb.dtype)
        out = jax.vmap(lambda o, p, v: o.at[p].set(v, mode="drop"))(out, pos_b, vb)
        out = jax.vmap(lambda o, p, v: o.at[p].set(v, mode="drop"))(out, pos_c, vc)
        return out

    out_d = scatter2(best_d, cd, jnp.inf)
    out_i = scatter2(best_i, ci, jnp.int32(-1))
    out_e = scatter2(best_e, ce, jnp.int32(1))
    return out_d, out_i, out_e


def mask_duplicates_any_order(ids: jax.Array) -> jax.Array:
    """Mark entries equal to an earlier-positioned entry (no sort needed):
    one [B, C, C] lower-triangle equality — cheap for beam-sized C."""
    b, c = ids.shape
    eq = ids[:, :, None] == ids[:, None, :]
    earlier = (
        jax.lax.broadcasted_iota(jnp.int32, (b, c, c), 2)
        < jax.lax.broadcasted_iota(jnp.int32, (b, c, c), 1)
    )
    return jnp.any(eq & earlier, axis=2)


def mask_duplicates_sorted(ids: jax.Array) -> jax.Array:
    """Given ids sorted along the last axis, mark second+ occurrences.

    Returns a bool mask, True where the entry is a duplicate of its left
    neighbor.  Invalid entries (INVALID_ID) are not treated specially; callers
    should pre-map invalids to a unique sentinel or mask afterwards.
    """
    left = jnp.concatenate(
        [jnp.full(ids.shape[:-1] + (1,), -2, dtype=ids.dtype), ids[..., :-1]],
        axis=-1,
    )
    return ids == left


def grouped_ranks(groups: jax.Array) -> jax.Array:
    """Occurrence rank of each element within its equal-value group.

    groups: [B, L] i32 group keys in PRIORITY order (earlier = better).
    Returns [B, L] i32: for position i, how many j < i share groups[j] ==
    groups[i].  The device formulation (shared by the diverse top-k
    post-process and the in-traversal diversity quota — reference
    ``DiversePriorityQueue``, `diskann/src/neighbor/diverse_priority_queue.rs`):
    sort (group, position), mark group starts, running-max the start
    positions (segmented iota), subtract, then invert the permutation with
    a second small sort.
    """
    b, l = groups.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, l), 1)
    ga, gp = jax.lax.sort((groups, pos), dimension=-1, num_keys=2)
    first = jnp.concatenate(
        [jnp.ones((b, 1), bool), ga[:, 1:] != ga[:, :-1]], axis=1
    )
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, pos, 0), axis=1
    )
    rank = pos - seg_start
    _, rank = jax.lax.sort((gp, rank), dimension=-1, num_keys=1)
    return rank
