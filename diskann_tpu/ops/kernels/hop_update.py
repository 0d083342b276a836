"""Fused beam-search hop update: merge + frontier select in ONE op.

STATUS: exact-parity with the unfused path (tested), but measured NEUTRAL on
v5e — ~7.3ms/hop at [4096, L=100, C=256] vs ~6ms unfused: the f32 one-hot
and rank broadcasts cost as much VMEM traffic as the XLA sorts they replace.
Kept opt-in (`beam_search_scored(fused=True)`) as the base for an i8-mask /
MXU-reduction variant.  A first production TPU run (2026-08-17) returned
recall 0.001 while interpret-mode parity passed — root cause was the batched
3-D `dot_general` payload application, which Mosaic silently miscompiles
(CLAUDE.md); now formulated as masked lane-sums.

Replaces ~8 XLA ops per `while` iteration (candidate sort-dedup, best-list
membership compare, 3-operand merge sort, frontier-position sort, gathers)
whose combined scheduling overhead dominates the hop on the target TPU.

Everything inside is dense VPU/MXU work with no dynamic indexing:

- duplicate + best-list membership masks via broadcasted equality;
- the merge is a *rank computation* (how many entries precede each element)
  followed by an inverse-permutation one-hot matmul on the MXU — equivalent
  to a stable merge sort of [best | candidates] truncated to L;
- frontier selection builds ranks of unexpanded entries with a
  strict-lower-triangular matmul (cumsum on the MXU) and extracts the W
  beam entries with one-hot contractions.

Ids ride through the f32 matmuls split into two 16-bit halves (exact).
Semantics match `beam_search_scored`'s dedup="list" path bit-for-bit; the
pure-jnp reference implementation `hop_update_ref` is the test oracle.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Python int (not a jnp scalar): jnp constants captured by a pallas kernel
# closure are rejected; literals inline fine.
_SENT = 2**31 - 1


class HopUpdate(NamedTuple):
    best_d: jax.Array    # [B, L] merged, ascending
    best_i: jax.Array    # [B, L]
    best_exp: jax.Array  # [B, L] (beam entries already marked expanded)
    beam_i: jax.Array    # [B, W] next frontier ids (-1 = converged)
    beam_d: jax.Array    # [B, W]
    fresh: jax.Array     # [B] i32 — candidates scored into the list


# "infinity" that survives the one-hot matmul: IEEE inf * 0 = NaN, so
# distances ride through the MXU clamped to a huge finite value instead.
_BIG = 1.0e38


def _core(best_d, best_i, best_exp, cand, cand_d, w: int):
    """Shared math (runs inside the kernel AND as the jnp reference).

    PRECONDITION: (cand, cand_d) are sorted ascending by cand_d with
    dropped candidates (duplicates / best-list members / padding) already
    masked to d >= _BIG — the caller does this with one cheap XLA sort so
    the kernel needs no O(C^2) comparisons: a candidate's rank among
    candidates IS its index.

    Mask discipline: every logical intermediate is an f32/i32 0/1 mask —
    Mosaic rejects stored-bool round trips (`arith.trunci i8 -> i1`), so
    AND is `*`, OR is `maximum`, NOT is `1 - x`, ANY is `max` reduce."""
    blk, l = best_d.shape
    c = cand.shape[1]
    t = l + c
    f32 = jnp.float32
    best_d = jnp.minimum(best_d, _BIG)

    fresh = (cand_d < _BIG).astype(f32) * (cand >= 0).astype(f32)    # [B,C] 0/1
    cd = jnp.minimum(cand_d, _BIG) * fresh + _BIG * (1.0 - fresh)
    ci = jnp.where(fresh > 0.5, cand, -1)

    # ---- merge ranks (stable: best entries precede equal candidates) ----
    rank_cc = jax.lax.broadcasted_iota(jnp.int32, (blk, c), 1).astype(f32)
    rank_cb = jnp.sum(
        (best_d[:, None, :] <= cd[:, :, None]).astype(f32), axis=2
    )
    pos_c = rank_cb + rank_cc
    rank_bc = jnp.sum(
        (cd[:, None, :] < best_d[:, :, None]).astype(f32), axis=2
    )
    pos_b = (
        jax.lax.broadcasted_iota(jnp.int32, (blk, l), 1).astype(f32) + rank_bc
    )

    # ---- inverse permutation via one-hot matmul, payloads via one matmul ----
    pos_all = jnp.concatenate([pos_b, pos_c], axis=1)                # [B,T]
    out_p = jax.lax.broadcasted_iota(jnp.int32, (blk, l, t), 1).astype(f32)
    onehot = (pos_all[:, None, :] == out_p).astype(f32)              # [B,L,T]

    # ids ride the masked reduction as f32 — exact for |id| < 2^24 (the fused
    # path is gated to indexes under 16M points per device/shard).
    # Payload application is three masked lane-sums over T, NOT a batched 3-D
    # dot_general: Mosaic silently miscompiles 3-D dot_general inside kernels
    # (wrong values, no error — observed as recall 0.001 on v5e while the
    # interpret-mode oracle passed; CLAUDE.md perf model).
    ids_all = jnp.concatenate([best_i, ci], axis=1)
    d_all = jnp.concatenate([best_d, cd], axis=1)                    # [B,T]
    e_all = jnp.concatenate([best_exp.astype(f32), 1.0 - fresh], axis=1)
    m_d = jnp.sum(onehot * d_all[:, None, :], axis=2)                # [B,L]
    m_i = jnp.sum(onehot * ids_all.astype(f32)[:, None, :], axis=2)
    m_e = jnp.sum(onehot * e_all[:, None, :], axis=2)
    # positions >= L never match out_p, so dropped entries contribute zeros;
    # a zero row would decode as (d=0, id=0): detect via onehot row-sum
    filled = jnp.sum(onehot, axis=2)                                 # [B,L] 0/1
    live = filled * (m_d < _BIG).astype(f32)
    new_d = jnp.where(live > 0.5, m_d, jnp.inf)
    new_i = jnp.where(filled > 0.5, m_i.astype(jnp.int32), -1)
    new_e = jnp.maximum(m_e * filled, 1.0 - filled)                  # [B,L] 0/1
    new_e = jnp.minimum(new_e + (1.0 - filled), 1.0)

    # ---- frontier: W closest unexpanded, marked expanded ----
    unexp = (1.0 - new_e) * (new_i >= 0).astype(f32)                 # [B,L] 0/1
    strict_lower = (
        jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    ).astype(f32)
    rank_u = jax.lax.dot_general(
        unexp, strict_lower, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )                                                                # [B,L]
    sel = unexp * (rank_u < w).astype(f32)
    ids_f = new_i.astype(f32)
    safe_d = jnp.where(jnp.isfinite(new_d), new_d, 0.0)
    beam_list = []
    for wi in range(w):
        pick = sel * (rank_u == wi).astype(f32)                      # [B,L]
        bid = jnp.sum(pick * ids_f, axis=1).astype(jnp.int32)
        bd = jnp.sum(pick * safe_d, axis=1)
        any_pick = jnp.sum(pick, axis=1)
        beam_list.append(
            (
                jnp.where(any_pick > 0.5, bid, -1),
                jnp.where(any_pick > 0.5, bd, jnp.inf),
            )
        )
    beam_i = jnp.stack([b for b, _ in beam_list], axis=1)
    beam_d = jnp.stack([d for _, d in beam_list], axis=1)
    new_e = jnp.minimum(new_e + sel, 1.0)

    fresh_n = jnp.sum(fresh, axis=1).astype(jnp.int32)
    return new_d, new_i, new_e.astype(jnp.int32), beam_i, beam_d, fresh_n


def prepare_candidates(best_i, cand, cand_d):
    """XLA-side preprocessing for the kernel's precondition: mask duplicates,
    best-list members and padding to d=_BIG, then sort by distance.  Two
    cheap multi-operand sorts + one membership compare."""
    cand = jnp.where(cand >= 0, cand, _SENT)
    cid, cdd = jax.lax.sort((cand, cand_d), dimension=-1, num_keys=1)
    left = jnp.concatenate([jnp.full_like(cid[:, :1], -2), cid[:, :-1]], axis=1)
    dup = cid == left
    in_list = jnp.any(cid[:, :, None] == best_i[:, None, :], axis=2)
    ok = (cid != _SENT) & ~dup & ~in_list
    cdd = jnp.where(ok, jnp.minimum(cdd, _BIG), _BIG)
    cdd, cid = jax.lax.sort((cdd, cid), dimension=-1, num_keys=1)
    return cid, cdd


def hop_update_ref(best_d, best_i, best_exp, cand, cand_d, w: int) -> HopUpdate:
    """Pure-jnp reference (test oracle / CPU fallback).
    Expects PREPARED candidates (see `prepare_candidates`)."""
    return HopUpdate(*_core(best_d, best_i, best_exp, cand, cand_d, w))


def _kernel(bd_ref, bi_ref, be_ref, c_ref, cd_ref, od, oi, oe, obi, obd, ofn,
            *, w: int):
    out = _core(bd_ref[:], bi_ref[:], be_ref[:], c_ref[:], cd_ref[:], w)
    od[:], oi[:], oe[:], obi[:], obd[:] = out[0], out[1], out[2], out[3], out[4]
    # rank-1 outputs need 128-multiple blocks on TPU; broadcast over W instead
    ofn[:] = jnp.broadcast_to(out[5][:, None], obi.shape)


@partial(jax.jit, static_argnames=("w", "block", "interpret"))
def hop_update(
    best_d, best_i, best_exp, cand, cand_d, *, w: int, block: int = 32,
    interpret: bool = False,
) -> HopUpdate:
    """Fused hop update as one pallas_call (grid over query blocks)."""
    b, l = best_d.shape
    c = cand.shape[1]
    assert b % block == 0, (b, block)
    grid = (b // block,)

    def row_spec(width):
        return pl.BlockSpec((block, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_kernel, w=w),
        grid=grid,
        in_specs=[row_spec(l), row_spec(l), row_spec(l), row_spec(c),
                  row_spec(c)],
        out_specs=(
            row_spec(l), row_spec(l), row_spec(l), row_spec(w), row_spec(w),
            row_spec(w),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l), jnp.float32),
            jax.ShapeDtypeStruct((b, l), jnp.int32),
            jax.ShapeDtypeStruct((b, l), jnp.int32),
            jax.ShapeDtypeStruct((b, w), jnp.int32),
            jax.ShapeDtypeStruct((b, w), jnp.float32),
            jax.ShapeDtypeStruct((b, w), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20),
        ),
    )(best_d, best_i, (best_exp != 0).astype(jnp.int32), cand, cand_d)
    return HopUpdate(out[0], out[1], out[2], out[3], out[4], out[5][:, 0])
