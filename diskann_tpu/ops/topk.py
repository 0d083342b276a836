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
