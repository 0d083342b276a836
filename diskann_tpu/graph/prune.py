"""Batched RobustPrune (alpha-occlusion pruning).

Reference: `DiskANNIndex::occlude_list`, `diskann/src/graph/index.rs:2565-2777`.
Semantics reproduced exactly for the TriangleInequality rule (L2/cosine):

- the candidate pool is sorted ascending by distance to the pruned point;
- alpha runs a ladder 1.0 -> alpha multiplying by min(alpha, 1.2) per rung
  (`index.rs:2599,2741`);
- within a rung, candidates are scanned in pool order and promoted when the
  max occlusion factor vs earlier-positioned already-promoted neighbors is
  <= the rung's alpha; promoted neighbors occlude only *later* positions
  (`index.rs:2692` skips `result_position >= i`);
- occlusion factors accumulate across rungs; promotion stops at `degree`.

TPU re-design: the sequential in-order scan is replaced by an equivalent
fixed-point iteration needing only O(degree / K) steps instead of O(pool):
because occlusion factors only grow within a rung, promoting "the first
eligible position, then occluding later positions" repeatedly yields exactly
the same promotion set and order as the reference's scan.  Each step
promotes up to K=8 neighbors at once — the first K eligible positions are
examined and a *prefix-consistent subset* is promoted (position i promoted
iff not occluded by the positions promoted before it in the same step),
which is provably identical to K rounds of single promotion since occlusion
factors only grow and eligibility only shrinks within a rung.  Each step is
a batched ``[B, C]`` mask update; the occluding distances d(j, k) for all K
promotees are one ``[B, K, d] x [B, C, d]`` MXU contraction — no [B, C, C]
pairwise tensor is ever materialized, and the dominant cost (streaming
pool_vecs from HBM) is paid once per K promotions instead of once each.

Divergence note (documented, deliberate): for the InnerProduct `Occluding`
rule the reference applies the knockout with the alpha of the rung in which a
(candidate, neighbor) pair happens to be lazily checked; we apply it eagerly
with the alpha of the neighbor's promotion rung.  For the default single- and
two-rung ladders the reachable difference is negligible and recall-neutral.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from diskann_tpu.graph.config import GraphConfig, PruneKind, OCCLUDING_MASK
from diskann_tpu.ops.distance import Metric, distance_to_set, squared_norms
from diskann_tpu.ops.topk import mask_duplicates_sorted

_INF = jnp.float32(jnp.inf)
_SENT = jnp.int32(2**31 - 1)


class PruneResult(NamedTuple):
    ids: jax.Array     # [B, R] i32 selected neighbors in promotion order, -1 pad
    dists: jax.Array   # [B, R] f32 distance of each selected neighbor to p
    count: jax.Array   # [B] i32


def _occlude_update(kind: PruneKind, occ, p_dist, jk_dist, alpha):
    """One neighbor's occlusion contribution — `config/mod.rs:update_occlude_factor`.

    p_dist: [B, C] d(p, k); jk_dist: [B, C] d(j, k) for the just-promoted j.
    """
    if kind == PruneKind.TriangleInequality:
        ratio = jnp.where(jk_dist == 0.0, _INF, p_dist / jk_dist)
        return jnp.maximum(occ, ratio)
    knocked = jk_dist < alpha * p_dist
    return jnp.where(knocked, jnp.float32(alpha + OCCLUDING_MASK), occ)


@partial(
    jax.jit,
    static_argnames=("degree", "alpha_ladder", "kind", "metric", "saturate"),
)
def _occlude_scan(
    pool_d: jax.Array,     # [B, C] sorted ascending, inf for invalid
    pool_vecs: jax.Array,  # [B, C, d] candidate vectors (pool order)
    pool_sq: jax.Array,    # [B, C] squared norms of pool_vecs
    valid: jax.Array,      # [B, C] bool
    *,
    degree: int,
    alpha_ladder: tuple,
    kind: PruneKind,
    metric: Metric,
    saturate: bool,
):
    b, c = pool_d.shape
    occ = jnp.where(valid, 0.0, _INF)          # [B, C]
    selected = jnp.zeros((b, c), dtype=jnp.bool_)
    found = jnp.zeros((b,), dtype=jnp.int32)
    # promotion order: sel_pos[b, n] = pool position of the n-th neighbor
    sel_pos = jnp.full((b, degree), c, dtype=jnp.int32)
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (b, c), 1)

    kk = max(min(16, degree, c), 1)  # promotions examined per step: wider
    # steps halve while_loop iterations (each pays the fixed scheduling
    # cost + one [B, K, C] contraction); the K x K in-register scan stays
    # exact for any K (prefix-consistent promotion, see module doc)

    def rung(alpha, occ, selected, found, sel_pos):
        alpha_f = jnp.float32(alpha)

        def cond(carry):
            occ, selected, found, sel_pos = carry
            eligible = (occ <= alpha_f) & ~selected & valid & (found[:, None] < degree)
            return jnp.any(eligible)

        def step(carry):
            occ, selected, found, sel_pos = carry
            room = jnp.minimum(degree - found, kk)                    # [B]
            eligible = (occ <= alpha_f) & ~selected & valid & (found[:, None] < degree)
            # first K eligible positions per row (ascending; c = none) —
            # exact partial selection via top_k of negated positions (a full
            # [B, C] sort costs ~log^2 C comparator passes; top_k is one)
            neg_k, _ = jax.lax.top_k(jnp.where(eligible, -pos_iota, -c), kk)
            pos_k = -neg_k                                            # [B, K]
            k_live = (pos_k < c) & (
                jax.lax.broadcasted_iota(jnp.int32, (b, kk), 1) < room[:, None]
            )
            safe_k = jnp.minimum(pos_k, c - 1)
            jvecs = jnp.take_along_axis(
                pool_vecs, safe_k[:, :, None], axis=1
            )                                                         # [B, K, d]
            jsq = jnp.take_along_axis(pool_sq, safe_k, axis=1)        # [B, K]
            jpd = jnp.take_along_axis(pool_d, safe_k, axis=1)         # [B, K]

            # pairwise among the K examined: d(e_j, e_i) for j < i, then a
            # tiny in-register scan decides the prefix-consistent subset
            dd = distance_to_set(
                jvecs.reshape(b * kk, -1),
                jnp.broadcast_to(
                    jvecs[:, None, :, :], (b, kk, kk, jvecs.shape[-1])
                ).reshape(b * kk, kk, -1),
                metric,
                x_sq_norms=jnp.broadcast_to(
                    jsq[:, None, :], (b, kk, kk)
                ).reshape(b * kk, kk),
                q_sq_norms=jsq.reshape(b * kk),
            ).reshape(b, kk, kk)                                      # [B, Kj, Ki]
            promote = [k_live[:, 0]]
            for i in range(1, kk):
                occ_i = jnp.zeros((b,), jnp.float32)
                for j in range(i):
                    occ_i = jnp.where(
                        promote[j],
                        _occlude_update(
                            kind, occ_i, jpd[:, i], dd[:, j, i], alpha_f
                        ),
                        occ_i,
                    )
                promote.append(k_live[:, i] & (occ_i <= alpha_f))
            promote = jnp.stack(promote, axis=1)                      # [B, K]

            # pool-wide occlusion update from ALL promoted at once:
            # one [B, K, d] x [B, C, d] contraction
            jk = jax.vmap(
                lambda jv, js, pv, ps: distance_to_set(
                    jv, pv, metric, x_sq_norms=ps, q_sq_norms=js
                )
            )(jvecs, jsq, pool_vecs, pool_sq)                         # [B, K, C]
            later = pos_iota[:, None, :] > pos_k[:, :, None]          # [B, K, C]
            apply = promote[:, :, None] & later
            if kind == PruneKind.TriangleInequality:
                ratio = jnp.where(jk == 0.0, _INF, pool_d[:, None, :] / jk)
                contrib = jnp.where(apply, ratio, -_INF).max(axis=1)  # [B, C]
                occ = jnp.maximum(occ, contrib)
            else:
                knocked = jnp.any(
                    apply & (jk < alpha_f * pool_d[:, None, :]), axis=1
                )
                occ = jnp.where(knocked, jnp.float32(alpha + OCCLUDING_MASK), occ)

            hit = jnp.any(
                (pos_iota[:, None, :] == pos_k[:, :, None]) & promote[:, :, None],
                axis=1,
            )
            selected = selected | hit
            csum = jnp.cumsum(promote.astype(jnp.int32), axis=1)
            slot_w = jnp.where(promote, found[:, None] + csum - 1, degree)
            sel_pos = jax.vmap(
                lambda sp, sw, pk_: sp.at[sw].set(pk_, mode="drop")
            )(sel_pos, slot_w, pos_k)
            found = found + csum[:, -1]
            return occ, selected, found, sel_pos

        occ, selected, found, sel_pos = jax.lax.while_loop(
            cond, step, (occ, selected, found, sel_pos)
        )
        return occ, selected, found, sel_pos

    for alpha in alpha_ladder:
        occ, selected, found, sel_pos = rung(alpha, occ, selected, found, sel_pos)

    if saturate:
        # Fill remaining slots in pool (distance) order with unselected valid
        # candidates — `index.rs:2766-2776`.
        fillable = valid & ~selected
        rank = jnp.cumsum(fillable.astype(jnp.int32), axis=1) - 1
        slot = found[:, None] + rank
        take = fillable & (slot < degree)
        sel_pos = jax.vmap(
            lambda sp, sl, t, p: sp.at[jnp.where(t, sl, degree)].set(p, mode="drop")
        )(sel_pos, slot, take, pos_iota)
        found = jnp.minimum(found + take.astype(jnp.int32).sum(axis=1), degree)

    return sel_pos, found


def robust_prune(
    p_vecs: jax.Array,        # [B, d] points being pruned
    cand_ids: jax.Array,      # [B, C] candidate ids (-1 invalid; may contain dups/self)
    cand_dists: jax.Array | None,  # [B, C] d(p, candidate); None -> recompute
    cand_vecs: jax.Array,     # [B, C, d] candidate vectors (gathered by caller)
    self_ids: jax.Array,      # [B] id of each pruned point (self-loop exclusion)
    config: GraphConfig,
    *,
    degree: int | None = None,
    saturate: bool | None = None,
) -> PruneResult:
    """Batched RobustPrune of B candidate pools at once.

    Handles id-dedup, self-exclusion and distance-sorting of the pool, then
    runs the occlusion scan.  Returns up to ``degree`` neighbors per row in
    promotion order (reference returns them in the same order,
    `index.rs:2744-2749`).

    Pass ``cand_dists=None`` to recompute exact distances from the gathered
    vectors — used when candidate generation ran on quantized codes so prune
    decisions stay full-precision (the reference's disk build does the same:
    PQ guides the search, full vectors feed the prune).
    """
    b, c = cand_ids.shape
    if cand_dists is None:
        cand_dists = distance_to_set(p_vecs, cand_vecs, config.metric)
    degree = degree if degree is not None else config.max_degree
    if saturate is None:
        saturate = config.saturate_after_prune and config.alpha > 1.0

    # --- dedup by id + drop self loops (`exclude` in occlude_list) ---
    invalid = (cand_ids < 0) | (cand_ids == self_ids[:, None])
    key = jnp.where(invalid, _SENT, cand_ids)
    order = jnp.argsort(key, axis=1)
    key_sorted = jnp.take_along_axis(key, order, axis=1)
    dup_sorted = mask_duplicates_sorted(key_sorted)
    # scatter dup flags back to original positions
    dup = jnp.zeros_like(invalid)
    dup = jax.vmap(lambda dd, o, v: dd.at[o].set(v))(dup, order, dup_sorted)
    valid = ~invalid & ~dup & (key != _SENT)

    # --- sort pool ascending by distance (invalid to the end) ---
    pool_d = jnp.where(valid, cand_dists, _INF)
    pool_d, perm = jax.lax.sort(
        (pool_d, jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32), (b, c))),
        dimension=-1, num_keys=1,
    )
    pool_ids = jnp.take_along_axis(cand_ids, perm, axis=1)
    pool_vecs = jnp.take_along_axis(cand_vecs, perm[:, :, None], axis=1)
    pool_valid = jnp.take_along_axis(valid, perm, axis=1)
    pool_sq = (
        squared_norms(pool_vecs)
        if config.metric.needs_norms
        else jnp.zeros((b, c), jnp.float32)
    )

    sel_pos, found = _occlude_scan(
        pool_d, pool_vecs, pool_sq, pool_valid,
        degree=degree,
        alpha_ladder=config.alpha_ladder(),
        kind=config.prune_kind,
        metric=config.metric,
        saturate=saturate,
    )

    slot_valid = jax.lax.broadcasted_iota(jnp.int32, (b, degree), 1) < found[:, None]
    safe = jnp.minimum(sel_pos, c - 1)
    out_ids = jnp.where(slot_valid, jnp.take_along_axis(pool_ids, safe, axis=1), -1)
    out_d = jnp.where(slot_valid, jnp.take_along_axis(pool_d, safe, axis=1), _INF)
    return PruneResult(ids=out_ids, dists=out_d, count=found)
