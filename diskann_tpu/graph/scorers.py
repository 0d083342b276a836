"""Scorers: the distance-computation plug-in point of the search loop.

This is the TPU analogue of the reference's provider/accessor glue
(`diskann/src/provider.rs:122`, `diskann/src/graph/glue.rs:125-254`): the
graph algorithm never touches storage directly — it asks an accessor to
expand a beam and score candidates.  Here a scorer is a `(ScorerDef, data)`
pair: `ScorerDef` holds jit-static callables, `data` holds the device arrays.

- ``full_precision_scorer``: gathers raw vectors and runs the batched MXU
  distance contraction (in-memory full-precision provider,
  `diskann-providers/src/model/graph/provider/async_/inmem/full_precision.rs`).
- ``pq_scorer``: gathers compact PQ codes and scores via per-query ADC
  lookup tables (`FixedChunkPQTable::direct_distance_impl`,
  `diskann-providers/src/model/pq/fixed_chunk_pq_table.rs:35`) — the
  traversal path of the SSD tier (`diskann-disk/.../disk_provider.rs:634`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from diskann_tpu.ops.distance import Metric, distance_to_set, squared_norms


@dataclasses.dataclass(frozen=True)
class ScorerDef:
    """Static half of a scorer (hashable; safe as a jit static argument).

    prep(data, queries) -> q_ctx            per-query precomputation
    score(data, q_ctx, ids, valid) -> d     [B, C] f32 distances (inf if invalid)
    expand (optional): fused neighbor expansion —
      expand(data, q_ctx, beam_ids, beam_valid) -> (cand_ids [B, C], d [B, C])
    When `expand` is set the search loop scores ALL neighbors of the beam in
    one shot from a packed per-node layout (one big row gather per beam node
    instead of one tiny row per candidate — the dominant cost on TPU, where
    gathers pay ~12ns/row regardless of row size).  This mirrors the disk
    tier's sector layout, which co-locates a node with its neighborhood
    (`diskann-disk/src/storage/disk_index_writer.rs`).
    """

    name: str
    prep: Callable[[Any, jax.Array], Any]
    score: Callable[[Any, Any, jax.Array, jax.Array], jax.Array]
    expand: Callable | None = None


# ---------------------------------------------------------------- full precision
def _fp_prep(metric: Metric):
    def prep(data, queries):
        q = queries
        qsq = squared_norms(q) if metric.needs_norms else jnp.zeros(
            (q.shape[0],), jnp.float32
        )
        return (q, qsq)

    return prep


def _fp_score(metric: Metric):
    def score(data, q_ctx, ids, valid):
        vectors, sq_norms = data
        q, qsq = q_ctx
        n = vectors.shape[0]
        safe = jnp.where(valid, ids, 0)
        cvec = vectors[jnp.clip(safe, 0, n - 1)]
        csq = sq_norms[jnp.clip(safe, 0, n - 1)]
        d = distance_to_set(q, cvec, metric, x_sq_norms=csq, q_sq_norms=qsq)
        return jnp.where(valid, d, jnp.inf)

    return score


_FP_DEFS = {m: ScorerDef(f"fp:{m.value}", _fp_prep(m), _fp_score(m)) for m in Metric}


def full_precision_scorer(vectors, sq_norms, metric: Metric):
    return _FP_DEFS[metric], (vectors, sq_norms)


# ------------------------------------------------------------------------- PQ
def _pq_prep(metric: Metric):
    def prep(data, queries):
        codes, pivots = data            # [N, m] int, [m, k, ds]
        m, k, ds = pivots.shape
        b = queries.shape[0]
        qc = queries[:, : m * ds].reshape(b, m, ds)
        # per-chunk distance tables: [B, m, k]
        if metric == Metric.L2:
            psq = jnp.sum(pivots.astype(jnp.float32) ** 2, axis=-1)  # [m, k]
            dots = jnp.einsum(
                "bmd,mkd->bmk", qc.astype(jnp.float32),
                pivots.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            qsq = jnp.sum(qc.astype(jnp.float32) ** 2, axis=-1)      # [B, m]
            lut = qsq[:, :, None] + psq[None] - 2.0 * dots
        else:
            dots = jnp.einsum(
                "bmd,mkd->bmk", qc.astype(jnp.float32),
                pivots.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            lut = -dots  # InnerProduct (cosine handled by normalized pivots)
        return lut.reshape(b, m * k)

    return prep


def _pq_score(metric: Metric):
    del metric

    def score(data, q_ctx, ids, valid):
        codes, pivots = data
        lut = q_ctx                      # [B, m*k]
        m, k, _ = pivots.shape
        n = codes.shape[0]
        safe = jnp.where(valid, ids, 0)
        c = codes[jnp.clip(safe, 0, n - 1)].astype(jnp.int32)   # [B, C, m]
        b, cc, _ = c.shape
        if k <= 32:
            # Low-bit ADC (4-bit PQ: k=16): replace the per-scalar LUT
            # gather with a masked broadcast-reduction.  The gather
            # formulation issues B*C*m scalar fetches/hop (~12ns EACH on
            # TPU regardless of size — the measured gather cost model), so
            # 4096q x 300cand x 192chunks = 236M fetches = seconds/hop.
            # The compare+select+sum is one fusable VPU loop nest — XLA
            # materializes nothing: codes stream in, LUT rows sit in
            # VMEM, and the k-way select costs k ops/element.  Only wins
            # for small k (k=256 would cost 16x the ops); the gather path
            # below stays for classic 8-bit PQ.  Reference ADC semantics:
            # `fixed_chunk_pq_table.rs:35` (scalar table walk).
            lutk = lut.reshape(b, 1, m, k)
            onehot = c[..., None] == jnp.arange(k, dtype=jnp.int32)
            d = jnp.sum(jnp.where(onehot, lutk, 0.0), axis=(2, 3))
        else:
            flat_idx = c + jnp.arange(m, dtype=jnp.int32)[None, None, :] * k
            d = jnp.take_along_axis(
                lut[:, None, :], flat_idx.reshape(b, cc * m)[:, None, :],
                axis=2,
            ).reshape(b, cc, m).sum(axis=-1)
        return jnp.where(valid, d, jnp.inf)

    return score


_PQ_DEFS = {m: ScorerDef(f"pq:{m.value}", _pq_prep(m), _pq_score(m)) for m in Metric}


def pq_scorer(codes, pivots, metric: Metric):
    """codes: [N, m] integer PQ codes; pivots: [m, k, ds] codebooks."""
    return _PQ_DEFS[metric], (codes, pivots)


# ------------------------------------------------------------------ int8 SQ
# Codes are stored CENTERED: code_c = round((x - bias)/scale) - 128 in int8,
# so the reconstruction is x_hat = scale * code_c + bias2 (bias2 = bias +
# 128*scale).  The query is quantized to int8 per-query at prep time so the
# candidate dot runs on the MXU int8 path with NO f32 materialization of the
# gathered [B, C, d] code block — that conversion would otherwise cost more
# HBM traffic than the gather itself.  Traversal tolerates the <1% dot error
# (the reference traverses on quantized distances too, `disk_provider.rs:634`)
# and the full-precision rerank restores exact ordering.
def _sq_prep(metric: Metric):
    def prep(data, queries):
        codes, scale, bias2, aux = data
        q = queries.astype(jnp.float32)
        qb = q - bias2[None, :] if metric.needs_norms else q
        qs = qb * scale[None, :]
        qscale = jnp.maximum(jnp.abs(qs).max(axis=1), 1e-20) / 127.0
        qi = jnp.clip(jnp.round(qs / qscale[:, None]), -127, 127).astype(jnp.int8)
        qsq = jnp.sum(qb * qb, axis=-1)
        return (qi, qscale, qsq)

    return prep


def _sq_score(metric: Metric):
    def score(data, q_ctx, ids, valid):
        codes, scale, bias2, aux = data    # [N, d] int8, [d], [d], [N]
        qi, qscale, qsq = q_ctx
        n = codes.shape[0]
        safe = jnp.clip(jnp.where(valid, ids, 0), 0, n - 1)
        c = codes[safe]                                # [B, C, d] int8
        dots_i = jax.lax.dot_general(
            qi, c, (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        dots = dots_i.astype(jnp.float32) * qscale[:, None]
        if metric == Metric.InnerProduct:
            d = -dots  # ranking-equivalent (per-query constant dropped)
        else:
            d = jnp.maximum(qsq[:, None] + aux[safe] - 2.0 * dots, 0.0)
        return jnp.where(valid, d, jnp.inf)

    return score


_SQ_DEFS = {m: ScorerDef(f"sq:{m.value}", _sq_prep(m), _sq_score(m)) for m in Metric}


def sq_center_codes(codes_u8, scale, bias):
    """uint8 codes -> centered int8 codes + adjusted bias (bias2)."""
    codes_i8 = (codes_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    bias2 = bias + 128.0 * scale
    return codes_i8, bias2


def sq_aux_norms(codes_i8, scale) -> jax.Array:
    """Precomputed ||scale * code_c||^2 per row (L2/cosine path)."""
    cs = codes_i8.astype(jnp.float32) * scale[None, :]
    return jnp.sum(cs * cs, axis=-1)


def sq_scorer(codes_i8, scale, bias2, aux, metric: Metric):
    """Scalar-quantized scorer over centered int8 codes (see module note).
    Rows are 4x smaller than f32, so the per-hop candidate gather — the
    bandwidth bottleneck of graph traversal — drops 4x."""
    return _SQ_DEFS[metric], (codes_i8, scale, bias2, aux)


# ---------------------------------------------------------------- minmax
# Per-vector training-free quantization (`diskann-quantization/src/minmax/
# quantizer.rs:69`): each row stores its own (lo, step) so no training pass
# blocks a streaming insert.  Decoded dot folds into one contraction:
# q . xhat = step * (q . c') + (lo + 128*step) * sum(q)  (c' centered int8).
def _mm_prep(metric: Metric):
    def prep(data, queries):
        q = queries.astype(jnp.float32)
        return (q, q.sum(axis=1), jnp.sum(q * q, axis=1))

    return prep


def _mm_score(metric: Metric):
    def score(data, q_ctx, ids, valid):
        codes_i8, lo, step, aux = data
        q, qsum, qsq = q_ctx
        n = codes_i8.shape[0]
        safe = jnp.clip(jnp.where(valid, ids, 0), 0, n - 1)
        c = codes_i8[safe].astype(jnp.float32)            # [B, C, d]
        raw = jax.lax.dot_general(
            q, c, (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                  # [B, C]
        st = step[safe]
        off = lo[safe] + 128.0 * st
        dot_qy = st * raw + off * qsum[:, None]
        if metric == Metric.InnerProduct:
            d = -dot_qy
        else:
            d = qsq[:, None] + aux[safe] - 2.0 * dot_qy
        return jnp.where(valid, d, jnp.inf)

    return score


_MM_DEFS = {m: ScorerDef(f"mm:{m.value}", _mm_prep(m), _mm_score(m)) for m in Metric}


def minmax_scorer(codes_i8, lo, step, aux, metric: Metric):
    """MinMax-quantized scorer: int8 rows (4x less gather bandwidth than
    f32) with per-row dequantization folded into the score formula."""
    return _MM_DEFS[metric], (codes_i8, lo, step, aux)


# -------------------------------------------------------------- spherical
# Sub-byte (RaBitQ-style) traversal: candidates' bit-packed spherical codes
# are gathered as uint32 words (1/2/4-bit codes cost 32/16/8 bytes per
# 128-dim row vs 128 for int8 — the gather-bandwidth analogue of the
# reference's spherical inmem provider,
# `diskann-providers/.../inmem/spherical.rs` over BitSlice storage).
def _sph_prep(metric: Metric):
    def prep(data, queries):
        words, norms, cscale, rotation = data
        qr = queries.astype(jnp.float32) @ rotation
        qsum = qr.sum(axis=1)
        qsq = jnp.sum(qr * qr, axis=1)
        return (qr, qsum, qsq)

    return prep


def _sph_score(metric: Metric, dim: int, n_bits: int):
    def score(data, q_ctx, ids, valid):
        from diskann_tpu.quant.bits import unpack_bits

        words, norms, cscale, rotation = data
        qr, qsum, qsq = q_ctx
        n = words.shape[0]
        b, c = ids.shape
        safe = jnp.clip(jnp.where(valid, ids, 0), 0, n - 1)
        w = words[safe]                                   # [B, C, Wd] u32
        codes = unpack_bits(
            w.reshape(b * c, -1), n_bits, dim
        ).reshape(b, c, dim).astype(jnp.float32)          # [B, C, d]
        raw = jax.lax.dot_general(
            qr, codes, (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                  # [B, C]
        lv = float((1 << n_bits) - 1)
        nc = (norms * cscale)[safe]
        dot_qy = nc * ((2.0 / lv) * raw - qsum[:, None])
        if metric == Metric.InnerProduct:
            d = -dot_qy
        else:
            d = qsq[:, None] + (norms[safe] ** 2) - 2.0 * dot_qy
        return jnp.where(valid, d, jnp.inf)

    return score


_SPH_DEFS = {}


def spherical_scorer(words, norms, cscale, rotation, dim: int, n_bits: int,
                     metric: Metric):
    """Bit-packed spherical scorer; `data` carries the packed word table
    (dim/n_bits are static — they parameterize the bit-slicing shifts)."""
    key = (metric, dim, n_bits)
    if key not in _SPH_DEFS:
        _SPH_DEFS[key] = ScorerDef(
            f"sph:{metric.value}:{n_bits}b", _sph_prep(metric),
            _sph_score(metric, dim, n_bits),
        )
    return _SPH_DEFS[key], (words, norms, cscale, rotation)


# ------------------------------------------------------------ packed fat-row
# Fat-row layout (`graph/packed.py`): one int8 row per node holds the ids,
# aux terms and int8 codes of ALL its neighbors.  Expanding a beam node is
# ONE row gather + in-register slice/bitcast decode — the TPU gather cost
# model is per-row issue, so folding the reference's three lookups
# (adjacency, aux, codes) into one row is a measured ~30% hop win on v5e.
# Distances are int8 dots against the projected, quantized query.  This
# trades HBM capacity for row count exactly like the reference's sector
# layout duplicates data so one SSD read serves a whole expansion.
def _packed_prep(metric: Metric):
    def prep(data, queries):
        rows, proj, pscale, pbias2, self_codes, self_aux = data
        q = queries.astype(jnp.float32) @ proj          # [B, dp]
        qb = q - pbias2[None, :] if metric.needs_norms else q
        qs = qb * pscale[None, :]
        qscale = jnp.maximum(jnp.abs(qs).max(axis=1), 1e-20) / 127.0
        qi = jnp.clip(jnp.round(qs / qscale[:, None]), -127, 127).astype(jnp.int8)
        qsq = jnp.sum(qb * qb, axis=-1)
        return (qi, qscale, qsq)

    return prep


_PACKED_DEFS = {}


def packed_scorer(packed, metric: Metric):
    """Fat-row packed scorer over a `PackedState`.  `self_codes [N, dp]`
    (+ aux) score arbitrary ids (start points); `rows [N, row_bytes]` serve
    beam expansion with one gather per node."""
    rp, dp = packed.r_pack, packed.dp
    key = (metric, rp, dp)
    if key not in _PACKED_DEFS:
        prep = _packed_prep(metric)
        nwr = packed.nwr
        aux_off_w, code_off_w = packed.aux_off_w, packed.code_off_w

        def score(data, q_ctx, ids, valid):
            # per-id scoring for start points: plain int8 row gather
            rows, proj, pscale, pbias2, self_codes, self_aux = data
            qi, qscale, qsq = q_ctx
            n = self_codes.shape[0]
            safe = jnp.clip(jnp.where(valid, ids, 0), 0, n - 1)
            c = self_codes[safe]
            dots_i = jax.lax.dot_general(
                qi, c, (((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            dots = dots_i.astype(jnp.float32) * qscale[:, None]
            if metric == Metric.InnerProduct:
                d = -dots
            else:
                d = jnp.maximum(qsq[:, None] + self_aux[safe] - 2.0 * dots, 0.0)
            return jnp.where(valid, d, jnp.inf)

        def _finish(cand, aux, dots_f32, qsq, beam_valid, b, w):
            cand = jnp.where(
                beam_valid.reshape(b, w, 1) > 0,
                cand.reshape(b, w, rp), -1,
            ).reshape(b, w * rp)
            if metric == Metric.InnerProduct:
                d = -dots_f32
            else:
                d = jnp.maximum(qsq[:, None] + aux - 2.0 * dots_f32, 0.0)
            return cand, jnp.where(cand >= 0, d, jnp.inf)

        def expand(data, q_ctx, beam_ids, beam_valid):
            import os

            from diskann_tpu.graph.packed import words_to_codes, words_to_f32

            rows, proj, pscale, pbias2, self_codes, self_aux = data
            qi, qscale, qsq = q_ctx
            n = rows.shape[0] // nwr
            b, w = beam_ids.shape
            use_kernel = (
                jax.default_backend() == "tpu"
                and os.environ.get("DISKANN_NO_FATKERNEL") != "1"
            )
            if use_kernel:
                # fused Pallas expand: pipelined word-row DMAs + in-VMEM
                # int8 scoring; the gathered words never round-trip through
                # HBM (measured 2.3 ms/hop vs 4.6 for the XLA gather+dot at
                # B=4096 W=4 R=84 dp=64 on v5e)
                from diskann_tpu.ops.kernels.fatrow_expand import fatrow_expand

                bw = b * w
                bwp = -(-bw // 512) * 512
                beam_flat = jnp.clip(beam_ids, 0, n - 1).reshape(bw)
                qiw = jnp.repeat(qi, w, axis=0)          # loop-invariant
                if bwp != bw:
                    beam_flat = jnp.pad(beam_flat, (0, bwp - bw))
                    qiw = jnp.pad(qiw, ((0, bwp - bw), (0, 0)))
                ids_w, aux_w, dots_i = fatrow_expand(
                    rows, beam_flat, qiw, rp=rp, dp=dp
                )
                cand = ids_w[:bw, :rp].reshape(b, w * rp)
                aux = words_to_f32(aux_w[:bw, :rp]).reshape(b, w * rp)
                dots = (
                    dots_i[:bw, :rp].reshape(b, w * rp).astype(jnp.float32)
                    * qscale[:, None]
                )
                return _finish(
                    cand, aux, dots, qsq, beam_valid, b, w
                )
            safe = jnp.clip(beam_ids, 0, n - 1)
            idx = safe[:, :, None] * nwr + jnp.arange(
                nwr, dtype=jnp.int32
            )[None, None, :]
            fat = rows[idx].reshape(b, w, nwr * 128)       # [B, W, words]
            cand = fat[:, :, :rp].reshape(b, w * rp)
            aux = words_to_f32(
                fat[:, :, aux_off_w : aux_off_w + rp]
            ).reshape(b, w * rp)
            codes = words_to_codes(
                fat[:, :, code_off_w : code_off_w + rp * (dp // 4)],
                rp * dp,
            ).reshape(b, w * rp, dp)
            dots_i = jax.lax.dot_general(
                qi, codes, (((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            dots = dots_i.astype(jnp.float32) * qscale[:, None]
            return _finish(cand, aux, dots, qsq, beam_valid, b, w)

        _PACKED_DEFS[key] = ScorerDef(
            f"packed:{metric.value}:{rp}x{dp}", prep, score, expand=expand
        )
    return _PACKED_DEFS[key], (
        packed.rows, packed.proj, packed.pscale, packed.pbias2,
        packed.self_codes, packed.self_aux,
    )


# ----------------------------------------------------------- router starts
def packed_router_starts(rc, raux, rids, proj, pscale, pbias2, queries,
                         metric: Metric, n_start: int, *, exact: bool = True):
    """Per-query entry points from a PRE-GATHERED router table.

    One int8 MXU matmul of the query batch against `rc` [S, dp] (the packed
    self-codes of `rids`, gathered once at refresh time rather than per
    dispatch — a 32k-row gather costs ~0.4-2.3 ms each call otherwise),
    then the `n_start` nearest router ids per query.  TPU-native stand-in
    for the reference's start-point strategies
    (`diskann/src/graph/start_point.rs:19-41`).  `exact=False` uses
    approx_min_k (fine for build-time candidate generation)."""
    q = queries.astype(jnp.float32) @ proj
    qb = q - pbias2[None, :] if metric.needs_norms else q
    qs = qb * pscale[None, :]
    qscale = jnp.maximum(jnp.abs(qs).max(axis=1), 1e-20) / 127.0
    qi = jnp.clip(jnp.round(qs / qscale[:, None]), -127, 127).astype(jnp.int8)
    dots = jax.lax.dot_general(
        qi, rc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * qscale[:, None]
    if metric == Metric.InnerProduct:
        d = -dots
    else:
        d = jnp.sum(qb * qb, axis=-1, keepdims=True) + raux[None, :] - 2.0 * dots
    if exact:
        _, top = jax.lax.top_k(-d, n_start)
    else:
        _, top = jax.lax.approx_min_k(d, n_start)
    return rids[top]
