"""Packed neighbor "fat-row" WORD layout + incremental maintenance.

One logical fat row per node holds EVERYTHING a beam expansion needs —
the node's neighbor ids, their ||code||^2 terms and their int8
PCA-projected codes — stored as a run of 128-word int32 rows in one flat
``[(cap+1) * nwr, 128] int32`` table:

    word-rows [0, idw)        ids   (r_pack x i32, -1-padded tail)
    word-rows [idw, 2*idw)    aux   (r_pack x f32 bit patterns)
    word-rows [2*idw, ...)    codes (r_pack x dp int8, 4 per word,
                              little-endian), then pad rows so nwr is a
                              multiple of 8

Why INT32 words, not bytes: TPU scatter cost is formulation-bound —
flat/2-D scalar and affine-iota int32 scatters run ~100ns/index where 2-D
column-indexed byte scatters serialize at ~2.5us/index, and the
i8<->i32 ``bitcast_convert_type`` that would bridge a byte table to word
scatters costs ~70ms/GB (it crosses the (8,128)(4,1) sublane packing) and
crashes the compiler outright at >=2GB.  With the table born as int32,
the backedge append is three in-place (row, col) scatters (~200ms for
512k edges vs 4s for byte scatters), ids decode with no bitcast at all,
and aux is a free elementwise bitcast.

Expanding a beam node is ONE contiguous [nwr, 128] DMA (per-row issue
cost, not per-byte; nwr % 8 == 0 satisfies Mosaic's dim0 alignment for
int32 (8,128) tiling).  The int8 codes are unpacked from words inside the
Pallas expand kernel with four arithmetic shifts — VPU work the
DMA-issue-bound kernel absorbs for free.  This is the direct analogue of
the disk tier's sector layout, which co-locates a node with its
neighborhood so one SSD read serves a whole expansion
(`diskann-disk/src/storage/disk_index_writer.rs`).

This module keeps the table consistent under graph mutations:
- `encode` / `set_self_codes`: project + quantize new vectors;
- `refresh_rows`: rebuild whole fat rows from adjacency (new nodes,
  re-pruned nodes, delete-patched nodes) via aligned-block DMA patching;
- `append_edges`: splice a single neighbor's (id, aux, code) into
  (target, slot) cells — the backedge fast path, no full-row rebuild.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from diskann_tpu.ops.distance import Metric


def padded_degree(r_slack: int, dp: int) -> int:
    """Smallest r >= r_slack with (r * dp) % 512 == 0 (code words fill
    whole 128-word rows)."""
    dpw = dp // 4
    step = 128 // math.gcd(dpw, 128)
    return -(-r_slack // step) * step


def id_wrows(r_pack: int) -> int:
    """128-word rows holding the id section (= aux section) of a fat row."""
    return -(-r_pack // 128)


def code_wrows(r_pack: int, dp: int) -> int:
    """128-word rows holding the code section."""
    return -(-(r_pack * (dp // 4)) // 128)


def n_wrows(r_pack: int, dp: int) -> int:
    """Total 128-word int32 rows per logical fat row, rounded up to a
    multiple of 8 (Mosaic DMA dim0 alignment)."""
    w = 2 * id_wrows(r_pack) + code_wrows(r_pack, dp)
    return -(-w // 8) * 8


def row_nbytes(r_pack: int, dp: int) -> int:
    """Fat-row byte width (all word rows of one logical row)."""
    return n_wrows(r_pack, dp) * 512


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("proj", "pscale", "pbias2", "self_codes", "self_aux", "rows"),
    meta_fields=("r_pack",),
)
@dataclasses.dataclass(frozen=True)
class PackedState:
    proj: jax.Array        # [d, dp] f32 projection (PCA / rotation)
    pscale: jax.Array      # [dp] f32 per-dim quant scale
    pbias2: jax.Array      # [dp] f32 adjusted bias (bias + 128*scale)
    self_codes: jax.Array  # [cap, dp] i8
    self_aux: jax.Array    # [cap] f32  (||code||^2 for L2; 0 for IP)
    rows: jax.Array        # [(cap+1)*nwr, 128] i32 word table (module doc)
    r_pack: int            # static: neighbor slots per row

    def _replace(self, **kw) -> "PackedState":
        return dataclasses.replace(self, **kw)

    @property
    def dp(self) -> int:
        return self.proj.shape[1]

    @property
    def idw(self) -> int:
        return id_wrows(self.r_pack)

    @property
    def nwr(self) -> int:
        return n_wrows(self.r_pack, self.dp)

    @property
    def aux_off_w(self) -> int:
        """Word offset of the aux section within a flattened logical row."""
        return self.idw * 128

    @property
    def code_off_w(self) -> int:
        """Word offset of the code section within a flattened logical row."""
        return 2 * self.idw * 128


def train_packed(
    vectors: np.ndarray, dp: int, metric: Metric, *, sigma: float = 4.0
):
    """Fit the projection + quantization params on (a sample of) vectors."""
    vecs = np.asarray(vectors, np.float32)
    d = vecs.shape[1]
    dp = min(dp, d)
    # dp/4 must divide 128 so a code never straddles a 128-word row
    while dp % 4 or 128 % (dp // 4):
        dp -= 1
    mu = vecs.mean(axis=0)
    cov = np.cov((vecs - mu).T).astype(np.float32)
    if cov.ndim == 0:  # d == 1
        cov = cov.reshape(1, 1)
    evals, evecs = np.linalg.eigh(cov)
    proj = np.ascontiguousarray(evecs[:, ::-1][:, :dp]).astype(np.float32)
    p = vecs @ proj
    mean, std = p.mean(axis=0), p.std(axis=0)
    lo, hi = mean - sigma * std, mean + sigma * std
    scale = np.maximum(hi - lo, 1e-12) / 255.0
    bias2 = lo + 128.0 * scale
    return jnp.asarray(proj), jnp.asarray(scale), jnp.asarray(bias2)


_INF_BITS = np.float32(np.inf).view(np.int32)


def _empty_rows(n: int, r_pack: int, dp: int) -> jax.Array:
    """Word rows for n empty fat rows: all neighbor ids -1, all aux slots
    +inf (the empty-slot conventions), codes zero.  Shape [n*nwr, 128]."""
    idw = id_wrows(r_pack)
    nwr = n_wrows(r_pack, dp)
    tmpl = np.zeros((nwr * 128,), np.int32)
    tmpl[: idw * 128] = -1
    tmpl[idw * 128 : 2 * idw * 128] = _INF_BITS
    return jnp.tile(jnp.asarray(tmpl.reshape(nwr, 128)), (n, 1))


def alloc_packed(proj, pscale, pbias2, capacity: int, r_slack: int,
                 *, writable: bool = True) -> PackedState:
    dp = proj.shape[1]
    rp = padded_degree(r_slack, dp)
    words = (capacity + 1) * n_wrows(rp, dp) * 128
    if writable and words >= 1 << 31:
        # append_edges addresses the word table through FLAT int32 affine
        # scatters (the only scatter form that doesn't serialize on TPU) —
        # a table over 2^31 words cannot be indexed that way.  Search and
        # refresh_rows index by WORD-ROW (< 2^24 at any realistic cap), so a
        # read-only layout (attach_packed(writable=False)) may exceed this.
        raise ValueError(
            f"packed table would be {words} i32 words (>= 2^31): "
            f"capacity={capacity} r_pack={rp} dp={dp}.  Reduce dp or "
            f"max_degree, shard the index (ShardedGraphIndex), or attach "
            f"a read-only layout (writable=False) for search-only use."
        )
    # +1 sacrificial DUMP row at index `capacity`: dropped writes (sentinel
    # id = cap) land there instead of needing per-write masking
    return PackedState(
        proj=proj,
        pscale=pscale,
        pbias2=pbias2,
        self_codes=jnp.zeros((capacity, dp), jnp.int8),
        self_aux=jnp.zeros((capacity,), jnp.float32),
        rows=_empty_rows(capacity + 1, rp, dp),
        r_pack=rp,
    )


def grow_packed(packed: PackedState, new_capacity: int) -> PackedState:
    cap = packed.self_codes.shape[0]
    extra = new_capacity - cap
    if extra <= 0:
        return packed
    # drop the old DUMP row (it accumulates garbage from dropped writes and
    # must not become node slot `cap`); fresh empties include a new dump row
    return packed._replace(
        self_codes=jnp.pad(packed.self_codes, ((0, extra), (0, 0))),
        self_aux=jnp.pad(packed.self_aux, (0, extra)),
        rows=jnp.concatenate(
            [
                packed.rows[: cap * packed.nwr],
                _empty_rows(extra + 1, packed.r_pack, packed.dp),
            ],
            axis=0,
        ),
    )


def encode(packed: PackedState, vecs: jax.Array, metric: Metric):
    """-> (codes [M, dp] i8, aux [M] f32)."""
    xp = vecs.astype(jnp.float32) @ packed.proj
    t = (xp - packed.pbias2[None, :]) / packed.pscale[None, :]
    codes = jnp.clip(jnp.round(t), -128, 127).astype(jnp.int8)
    cs = codes.astype(jnp.float32) * packed.pscale[None, :]
    if metric == Metric.InnerProduct:
        aux = jnp.zeros((vecs.shape[0],), jnp.float32)
    else:
        aux = jnp.sum(cs * cs, axis=-1)
    return codes, aux


def set_self_codes(packed: PackedState, slot_ids, codes, aux) -> PackedState:
    cap = packed.self_codes.shape[0]
    w = jnp.where(slot_ids >= 0, slot_ids, cap)
    return packed._replace(
        self_codes=packed.self_codes.at[w].set(codes, mode="drop"),
        self_aux=packed.self_aux.at[w].set(aux, mode="drop"),
    )


def codes_to_words(codes: jax.Array) -> jax.Array:
    """[..., dp] i8 -> [..., dp/4] i32 (little-endian device bitcast)."""
    return jax.lax.bitcast_convert_type(
        codes.reshape(*codes.shape[:-1], codes.shape[-1] // 4, 4), jnp.int32
    )


def f32_to_words(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def words_to_f32(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def words_to_codes(words: jax.Array, dp: int) -> jax.Array:
    """[..., dp/4] i32 -> [..., dp] i8."""
    b = jax.lax.bitcast_convert_type(words, jnp.int8)   # [..., dp/4, 4]
    return b.reshape(*words.shape[:-1], dp)


def refresh_rows(packed: PackedState, adjacency: jax.Array, rows) -> PackedState:
    """Rebuild full fat rows for `rows` from current adjacency."""
    cap, r_slack = adjacency.shape
    dp = packed.dp
    rp = packed.r_pack
    idw = packed.idw
    nwr = packed.nwr
    rows = jnp.asarray(rows, jnp.int32)
    t = rows.shape[0]
    safe_rows = jnp.clip(rows, 0, cap - 1)
    arows = adjacency[safe_rows]                       # [T, Rs]
    if rp > r_slack:  # alignment pad slots stay empty
        arows = jnp.pad(
            arows, ((0, 0), (0, rp - r_slack)), constant_values=-1
        )
    safe = jnp.clip(arows, 0, cap - 1)
    codes = packed.self_codes[safe]                    # [T, rp, dp] i8
    code_w = codes_to_words(codes).reshape(t, rp * (dp // 4))
    aux = jnp.where(arows >= 0, packed.self_aux[safe], jnp.inf)
    sec_pad = idw * 128 - rp
    fat = jnp.concatenate(
        [
            jnp.pad(arows, ((0, 0), (0, sec_pad)), constant_values=-1),
            jnp.pad(f32_to_words(aux), ((0, 0), (0, sec_pad)),
                    constant_values=_INF_BITS),
            code_w,
        ],
        axis=-1,
    )
    tail = nwr * 128 - fat.shape[1]
    if tail:
        fat = jnp.pad(fat, ((0, 0), (0, tail)))
    w = jnp.where((rows >= 0) & (rows < cap), rows, cap)

    import os

    if jax.default_backend() == "tpu" and os.environ.get(
        "DISKANN_NO_BLOCK_PATCH"
    ) != "1":
        # aligned-block DMA patching: XLA's windowed scatter serializes per
        # index; the kernel copies [8, 128] blocks at DMA issue rate
        from diskann_tpu.ops.kernels.block_patch import (
            PATCH_BLOCK, block_patch,
        )

        nblk = nwr // 8
        gidx = (
            w[:, None] * nblk + jnp.arange(nblk, dtype=jnp.int32)[None, :]
        ).reshape(-1)
        vals = fat.reshape(t * nwr, 128)
        pad = (-gidx.shape[0]) % PATCH_BLOCK
        if pad:
            gidx = jnp.pad(gidx, (0, pad), constant_values=cap * nblk)
            vals = jnp.pad(vals, ((0, pad * 8), (0, 0)))
        return packed._replace(rows=block_patch(packed.rows, gidx, vals))

    idx = (w[:, None] * nwr + jnp.arange(nwr, dtype=jnp.int32)[None, :]).reshape(-1)
    return packed._replace(
        rows=packed.rows.at[idx].set(
            fat.reshape(t * nwr, 128), mode="drop"
        )
    )


def logical_rows(packed: PackedState) -> jax.Array:
    """The word table viewed as [cap+1, nwr*128] flattened logical rows
    (decode with the `*_off_w` word offsets).  Test/debug helper."""
    cap1 = packed.rows.shape[0] // packed.nwr
    return packed.rows.reshape(cap1, packed.nwr * 128)


# Donating wrappers for host-driven maintenance loops: without donation each
# functional update would materialize a second copy of the multi-GB rows
# table and OOM the chip.
refresh_rows_donated = jax.jit(refresh_rows, donate_argnums=(0,))
set_self_codes_donated = jax.jit(set_self_codes, donate_argnums=(0,))


def append_edges(packed: PackedState, tgt, slot, src, ok) -> PackedState:
    """Splice src's (id, aux, code) into (tgt, slot) — the backedge fast path.

    Three FLAT affine int32-word scatters on `rows.reshape(-1)`: 2-D
    (row, col) scatters with data-dependent columns serialize (~175ns/word,
    1.65s per 512k-edge batch measured in profile_build), while flat affine
    word scatters run ~10-30ns/word (the [E,16] case in 87ms; CLAUDE.md
    cost model).  The flat index of slot s in row t is affine because dpw
    divides 128, so `(s*dpw)//128*128 + (s*dpw)%128 == s*dpw` exactly:

      id   word: t*nwr*128 + s
      aux  word: t*nwr*128 + idw*128 + s
      code word: t*nwr*128 + 2*idw*128 + s*dpw + k,  k in [0, dpw)

    Fully in place under donation."""
    if packed.rows.size >= 1 << 31:
        raise ValueError(
            "append_edges needs flat int32 word addressing; this packed "
            "table was attached read-only (>= 2^31 words).  Re-attach with "
            "a smaller dp for streaming updates."
        )
    cap = packed.self_codes.shape[0]
    dp = packed.dp
    dpw = dp // 4
    idw = packed.idw
    nwr = packed.nwr
    codes = packed.self_codes[jnp.clip(src, 0, cap - 1)]      # [E, dp]
    aux = packed.self_aux[jnp.clip(src, 0, cap - 1)]          # [E]

    slot_s = jnp.where(ok, slot, 0).astype(jnp.int32)
    tgt_s = jnp.where(ok, tgt, cap).astype(jnp.int32)  # cap = dump row

    base = tgt_s * (nwr * 128)
    id_w = jnp.asarray(src, jnp.int32)
    aux_w = f32_to_words(aux)
    code_w = codes_to_words(codes)                            # [E, dpw]

    flat = packed.rows.reshape(-1)
    flat = flat.at[base + slot_s].set(id_w, mode="drop")
    flat = flat.at[base + idw * 128 + slot_s].set(aux_w, mode="drop")
    kw = jnp.arange(dpw, dtype=jnp.int32)[None, :]
    cbase = base + 2 * idw * 128 + slot_s * dpw
    flat = flat.at[cbase[:, None] + kw].set(code_w, mode="drop")
    return packed._replace(rows=flat.reshape(packed.rows.shape))


# The deferred alias remains for host callers; with the int32 word table
# the scatters are in-place and jit-safe, so it is just append_edges.
def append_edges_deferred(packed: PackedState, tgt, slot, src, ok,
                          **_legacy) -> PackedState:
    return _append_edges_donated(
        packed, jnp.asarray(tgt, jnp.int32), jnp.asarray(slot, jnp.int32),
        jnp.asarray(src, jnp.int32), jnp.asarray(ok),
    )


_append_edges_donated = jax.jit(append_edges, donate_argnums=(0,))
