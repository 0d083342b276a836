"""Packed neighbor "fat-row" layout + incremental maintenance.

One int8 row per node holds EVERYTHING a beam expansion needs:

    rows[i] = [ ids: r_pack x i32 | aux: r_pack x f32 | codes: r_pack*dp x i8 | pad ]

i.e. the node's neighbor ids, their ||code||^2 terms and their int8
PCA-projected codes, contiguous.  Expanding a beam node is then ONE row
gather (the TPU cost model is per-row issue, not per-byte: measured on
v5e, three split gathers of ids/aux/codes cost 6.5 ms/hop where the fat
row costs 4.6 at B=4096, W=4, R=84, dp=64).  Sections are decoded with
slices + bitcasts after the gather.  This is the direct analogue of the
disk tier's sector layout, which co-locates a node with its neighborhood
so one SSD read serves a whole expansion
(`diskann-disk/src/storage/disk_index_writer.rs`).

Rows are padded to a multiple of 128 bytes (the int8 (32, 128) minor tile)
— misaligned rows gather ~15% slower (measured).

This module keeps the table consistent under graph mutations:
- `encode` / `set_self_codes`: project + quantize new vectors;
- `refresh_rows`: rebuild whole fat rows from adjacency (new nodes,
  re-pruned nodes, delete-patched nodes);
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
    """Smallest r >= r_slack with (r * dp) % 128 == 0 (code-section tiling)."""
    step = 128 // math.gcd(dp, 128)
    return -(-r_slack // step) * step


def row_nbytes(r_pack: int, dp: int) -> int:
    """Fat-row byte width: ids + aux + codes, padded to 128-byte tiles."""
    return -(-(r_pack * (8 + dp)) // 128) * 128


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
    rows: jax.Array        # [cap, row_nbytes] i8 fat rows (see module doc)
    r_pack: int            # static: neighbor slots per row

    def _replace(self, **kw) -> "PackedState":
        return dataclasses.replace(self, **kw)

    @property
    def dp(self) -> int:
        return self.proj.shape[1]

    @property
    def ids_off(self) -> int:
        return 0

    @property
    def aux_off(self) -> int:
        return self.r_pack * 4

    @property
    def code_off(self) -> int:
        return self.r_pack * 8


def train_packed(
    vectors: np.ndarray, dp: int, metric: Metric, *, sigma: float = 4.0
):
    """Fit the projection + quantization params on (a sample of) vectors."""
    vecs = np.asarray(vectors, np.float32)
    d = vecs.shape[1]
    dp = min(dp, d)
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


def _empty_rows(n: int, r_pack: int, dp: int) -> jax.Array:
    """Fat rows with all neighbor ids -1 and all aux slots +inf (the
    empty-slot conventions of the split layout), codes zero."""
    row = row_nbytes(r_pack, dp)
    out = jnp.zeros((n, row), jnp.int8)
    out = out.at[:, : r_pack * 4].set(jnp.int8(-1))
    inf_bytes = jax.lax.bitcast_convert_type(
        jnp.full((r_pack,), jnp.inf, jnp.float32), jnp.int8
    ).reshape(r_pack * 4)
    return out.at[:, r_pack * 4 : r_pack * 8].set(inf_bytes[None, :])


def alloc_packed(proj, pscale, pbias2, capacity: int, r_slack: int) -> PackedState:
    dp = proj.shape[1]
    rp = padded_degree(r_slack, dp)
    # +1 sacrificial DUMP row at index `capacity`: dropped writes (sentinel
    # id = cap) land there instead of needing per-write masking, which lets
    # the Pallas append kernel issue unconditional DMAs.
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
    return packed._replace(
        self_codes=jnp.pad(packed.self_codes, ((0, extra), (0, 0))),
        self_aux=jnp.pad(packed.self_aux, (0, extra)),
        rows=jnp.concatenate(
            [packed.rows, _empty_rows(extra, packed.r_pack, packed.dp)], axis=0
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


def _i32_to_bytes(x: jax.Array) -> jax.Array:
    """[..., K] i32 -> [..., K*4] i8 (little-endian device bitcast)."""
    b = jax.lax.bitcast_convert_type(x, jnp.int8)        # [..., K, 4]
    return b.reshape(*x.shape[:-1], x.shape[-1] * 4)


def _f32_to_bytes(x: jax.Array) -> jax.Array:
    b = jax.lax.bitcast_convert_type(x, jnp.int8)
    return b.reshape(*x.shape[:-1], x.shape[-1] * 4)


def bytes_to_i32(x: jax.Array, k: int) -> jax.Array:
    """[..., K*4] i8 -> [..., K] i32."""
    return jax.lax.bitcast_convert_type(
        x.reshape(*x.shape[:-1], k, 4), jnp.int32
    )


def bytes_to_f32(x: jax.Array, k: int) -> jax.Array:
    return jax.lax.bitcast_convert_type(
        x.reshape(*x.shape[:-1], k, 4), jnp.float32
    )


def refresh_rows(packed: PackedState, adjacency: jax.Array, rows) -> PackedState:
    """Rebuild full fat rows for `rows` from current adjacency."""
    cap, r_slack = adjacency.shape
    dp = packed.dp
    rp = packed.r_pack
    rows = jnp.asarray(rows, jnp.int32)
    t = rows.shape[0]
    safe_rows = jnp.clip(rows, 0, cap - 1)
    arows = adjacency[safe_rows]                       # [T, Rs]
    if rp > r_slack:  # alignment pad slots stay empty
        arows = jnp.pad(
            arows, ((0, 0), (0, rp - r_slack)), constant_values=-1
        )
    safe = jnp.clip(arows, 0, cap - 1)
    codes = packed.self_codes[safe].reshape(t, rp * dp)
    aux = jnp.where(arows >= 0, packed.self_aux[safe], jnp.inf)
    fat = jnp.concatenate(
        [_i32_to_bytes(arows), _f32_to_bytes(aux), codes], axis=-1
    )
    tail = packed.rows.shape[1] - fat.shape[1]
    if tail:
        fat = jnp.pad(fat, ((0, 0), (0, tail)))
    w = jnp.where((rows >= 0) & (rows < cap), rows, cap)
    return packed._replace(rows=packed.rows.at[w].set(fat, mode="drop"))


# Donating wrappers for host-driven maintenance loops: without donation each
# functional update would materialize a second copy of the multi-GB rows
# table and OOM the chip.
refresh_rows_donated = jax.jit(refresh_rows, donate_argnums=(0,))
set_self_codes_donated = jax.jit(set_self_codes, donate_argnums=(0,))


def append_edges(packed: PackedState, tgt, slot, src, ok) -> PackedState:
    """Splice src's (id, aux, code) into (tgt, slot) — the backedge fast path.

    One 2-D byte scatter into the flat [cap, row_nbytes] int8 table covers
    all three sections (the flat layout keeps indices within int32 and
    avoids the 4x tile-padding a 3-D int8 view would cost)."""
    cap = packed.self_codes.shape[0]
    dp = packed.dp
    e = tgt.shape[0]
    codes = packed.self_codes[jnp.clip(src, 0, cap - 1)]      # [E, dp]
    aux = packed.self_aux[jnp.clip(src, 0, cap - 1)]          # [E]
    id_bytes = _i32_to_bytes(jnp.asarray(src, jnp.int32)[:, None])   # [E, 4]
    aux_bytes = _f32_to_bytes(aux[:, None])                          # [E, 4]

    slot_s = jnp.where(ok, slot, 0)
    tgt_s = jnp.where(ok, tgt, cap)   # cap = the sacrificial dump row

    import os

    # Opt-in: inside larger XLA programs the rows buffer can be assigned a
    # tiled layout, which Mosaic rejects for the kernel's [1, k] DMA slices
    # ("Slice shape along dimension 0 must be aligned to tiling (8)").
    # Standalone calls (linear entry layout) work — see scripts/
    # kernel_append_check.py.  Default off until the layout is pinned.
    if jax.default_backend() == "tpu" and os.environ.get(
        "DISKANN_APPEND_KERNEL"
    ) == "1":
        from diskann_tpu.ops.kernels.fatrow_append import (
            EDGE_BLOCK, fatrow_append,
        )

        e = tgt_s.shape[0]
        pad = (-e) % EDGE_BLOCK
        if pad:
            tgt_s = jnp.pad(tgt_s, (0, pad), constant_values=cap)
            slot_s = jnp.pad(slot_s, (0, pad))
            id_bytes = jnp.pad(id_bytes, ((0, pad), (0, 0)))
            aux_bytes = jnp.pad(aux_bytes, ((0, pad), (0, 0)))
            codes = jnp.pad(codes, ((0, pad), (0, 0)))
        recs = jnp.concatenate([id_bytes, aux_bytes, codes], axis=-1)
        recs = jnp.pad(recs, ((0, 0), (0, 128 - recs.shape[1])))
        rows_t = fatrow_append(
            packed.rows, tgt_s.astype(jnp.int32), slot_s.astype(jnp.int32),
            recs, rp=packed.r_pack, dp=dp,
        )
        return packed._replace(rows=rows_t)

    # Chunked affine-iota scatters.  Measured on v5e at E=512k, cap=1M:
    # a lax.scatter with [E, 2] window indices runs at 7.3s/batch and an
    # unchunked per-byte affine scatter OOMs at compile (the [E, dp, 2] s32
    # index tensor tile-pads 64x); 64k-edge chunks keep the index temp at
    # ~2GB and run ~2x faster than the window form.  Still ~4s/batch — the
    # TPU scatter lowering is inherently serial; this is the XLA fallback
    # path, superseded where possible by the Pallas append kernel.
    e = tgt_s.shape[0]
    ch = min(65536, e)
    b4 = jnp.arange(4, dtype=jnp.int32)[None, :]
    bd = jnp.arange(dp, dtype=jnp.int32)[None, :]
    n_chunks = -(-e // ch)
    pad_to = n_chunks * ch
    if pad_to != e:
        padc = pad_to - e
        tgt_s = jnp.pad(tgt_s, (0, padc), constant_values=cap)
        slot_s = jnp.pad(slot_s, (0, padc))
        id_bytes = jnp.pad(id_bytes, ((0, padc), (0, 0)))
        aux_bytes = jnp.pad(aux_bytes, ((0, padc), (0, 0)))
        codes = jnp.pad(codes, ((0, padc), (0, 0)))

    def body(i, acc):
        t = jax.lax.dynamic_slice(tgt_s, (i * ch,), (ch,))
        s = jax.lax.dynamic_slice(slot_s, (i * ch,), (ch,))
        ib = jax.lax.dynamic_slice(id_bytes, (i * ch, 0), (ch, 4))
        ab = jax.lax.dynamic_slice(aux_bytes, (i * ch, 0), (ch, 4))
        cd = jax.lax.dynamic_slice(codes, (i * ch, 0), (ch, dp))

        def sc(a, cols, vals):
            r2 = jnp.broadcast_to(t[:, None], cols.shape)
            return a.at[r2, cols].set(vals, mode="drop")

        acc = sc(acc, s[:, None] * 4 + b4, ib)
        acc = sc(acc, packed.aux_off + s[:, None] * 4 + b4, ab)
        acc = sc(acc, packed.code_off + s[:, None] * dp + bd, cd)
        return acc

    rows_t = jax.lax.fori_loop(0, n_chunks, body, packed.rows)
    return packed._replace(rows=rows_t)
