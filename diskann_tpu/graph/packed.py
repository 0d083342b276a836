"""Packed neighbor "fat-row" sector layout + incremental maintenance.

One logical fat row per node holds EVERYTHING a beam expansion needs —
the node's neighbor ids, their ||code||^2 terms and their int8
PCA-projected codes — stored as a run of 128-byte *sectors* in one flat
``[(cap+1) * nsec, 128] int8`` table:

    sectors [0, id_secs)          ids   (r_pack x i32, zero-padded tail)
    sectors [id_secs, 2*id_secs)  aux   (r_pack x f32)
    sectors [2*id_secs, ...)      codes (r_pack x dp i8), then pad sectors
                                  so nsec is a multiple of 8

Expanding a beam node is then ONE contiguous [nsec, 128] read (the TPU
cost model is per-row issue, not per-byte: measured on v5e, three split
gathers of ids/aux/codes cost 6.5 ms/hop where one fat-row gather costs
4.6 at B=4096, W=4, R=84, dp=64).  The sector shape exists for the fused
Pallas expand kernel (`ops/kernels/fatrow_expand.py`, measured 2.3
ms/hop): Mosaic accepts [nsec, 128] HBM->VMEM DMAs at nsec-aligned row
offsets (nsec % 8 == 0), where [1, nsec*128] slices of a 2-D
[cap, nsec*128] table are rejected ("dim0 slices must be 8-aligned").
This is the direct analogue of the disk tier's sector layout, which
co-locates a node with its neighborhood so one SSD read serves a whole
expansion (`diskann-disk/src/storage/disk_index_writer.rs`).

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


def id_sectors(r_pack: int) -> int:
    """Sectors holding the id section (= aux section) of a fat row."""
    return -(-r_pack * 4 // 128)


def n_sectors(r_pack: int, dp: int) -> int:
    """Total 128-byte sectors per logical fat row: ids + aux + codes,
    rounded up to a multiple of 8 (Mosaic DMA dim0 alignment)."""
    secs = 2 * id_sectors(r_pack) + (-(-r_pack * dp // 128))
    return -(-secs // 8) * 8


def row_nbytes(r_pack: int, dp: int) -> int:
    """Fat-row byte width (all sectors of one logical row)."""
    return n_sectors(r_pack, dp) * 128


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
    rows: jax.Array        # [(cap+1)*nsec, 128] i8 sector table (module doc)
    r_pack: int            # static: neighbor slots per row

    def _replace(self, **kw) -> "PackedState":
        return dataclasses.replace(self, **kw)

    @property
    def dp(self) -> int:
        return self.proj.shape[1]

    @property
    def id_secs(self) -> int:
        return id_sectors(self.r_pack)

    @property
    def nsec(self) -> int:
        return n_sectors(self.r_pack, self.dp)

    @property
    def ids_off(self) -> int:
        return 0

    @property
    def aux_off(self) -> int:
        """Byte offset of the aux section within a flattened logical row."""
        return self.id_secs * 128

    @property
    def code_off(self) -> int:
        """Byte offset of the code section within a flattened logical row."""
        return 2 * self.id_secs * 128


def train_packed(
    vectors: np.ndarray, dp: int, metric: Metric, *, sigma: float = 4.0
):
    """Fit the projection + quantization params on (a sample of) vectors."""
    vecs = np.asarray(vectors, np.float32)
    d = vecs.shape[1]
    dp = min(dp, d)
    # dp must divide 128 so a code never straddles a 128-byte sector
    while 128 % dp:
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


def _empty_rows(n: int, r_pack: int, dp: int) -> jax.Array:
    """Sector rows for n empty fat rows: all neighbor ids -1, all aux slots
    +inf (the empty-slot conventions), codes zero.  Shape [n*nsec, 128]."""
    id_s = id_sectors(r_pack)
    nsec = n_sectors(r_pack, dp)
    tmpl = np.zeros((nsec * 128,), np.int8)
    tmpl[: id_s * 128] = -1
    inf_bytes = np.frombuffer(
        np.full((id_s * 32,), np.inf, np.float32).tobytes(), np.int8
    )
    tmpl[id_s * 128 : 2 * id_s * 128] = inf_bytes
    return jnp.tile(jnp.asarray(tmpl.reshape(nsec, 128)), (n, 1))


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
    # drop the old DUMP row (it accumulates garbage from dropped writes and
    # must not become node slot `cap`); fresh empties include a new dump row
    return packed._replace(
        self_codes=jnp.pad(packed.self_codes, ((0, extra), (0, 0))),
        self_aux=jnp.pad(packed.self_aux, (0, extra)),
        rows=jnp.concatenate(
            [
                packed.rows[: cap * packed.nsec],
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
    id_s = packed.id_secs
    nsec = packed.nsec
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
    sec_pad = id_s * 128 - rp * 4
    fat = jnp.concatenate(
        [
            jnp.pad(_i32_to_bytes(arows), ((0, 0), (0, sec_pad))),
            jnp.pad(_f32_to_bytes(aux), ((0, 0), (0, sec_pad))),
            codes,
        ],
        axis=-1,
    )
    tail = nsec * 128 - fat.shape[1]
    if tail:
        fat = jnp.pad(fat, ((0, 0), (0, tail)))
    w = jnp.where((rows >= 0) & (rows < cap), rows, cap)

    import os

    if jax.default_backend() == "tpu" and os.environ.get(
        "DISKANN_NO_BLOCK_PATCH"
    ) != "1":
        # aligned-block DMA patching: XLA's scatter serializes per index
        # (~2-14 us each; T*nsec sector rows per refresh), the kernel copies
        # [8, 128] blocks at DMA issue rate (~0.14 us)
        from diskann_tpu.ops.kernels.block_patch import (
            PATCH_BLOCK, block_patch,
        )

        nblk = nsec // 8
        gidx = (
            w[:, None] * nblk + jnp.arange(nblk, dtype=jnp.int32)[None, :]
        ).reshape(-1)
        vals = fat.reshape(t * nsec, 128)
        pad = (-gidx.shape[0]) % PATCH_BLOCK
        if pad:
            gidx = jnp.pad(gidx, (0, pad), constant_values=cap * nblk)
            vals = jnp.pad(vals, ((0, pad * 8), (0, 0)))
        return packed._replace(rows=block_patch(packed.rows, gidx, vals))

    idx = (w[:, None] * nsec + jnp.arange(nsec, dtype=jnp.int32)[None, :]).reshape(-1)
    return packed._replace(
        rows=packed.rows.at[idx].set(
            fat.reshape(t * nsec, 128), mode="drop"
        )
    )


def logical_rows(packed: PackedState) -> jax.Array:
    """The sector table viewed as [cap+1, nsec*128] flattened logical rows
    (decode with the `*_off` byte offsets).  Test/debug helper — the
    reshape relayouts, don't use it in hot paths."""
    cap1 = packed.rows.shape[0] // packed.nsec
    return packed.rows.reshape(cap1, packed.nsec * 128)


# Donating wrappers for host-driven maintenance loops: without donation each
# functional update would materialize a second copy of the multi-GB rows
# table and OOM the chip.
refresh_rows_donated = jax.jit(refresh_rows, donate_argnums=(0,))
set_self_codes_donated = jax.jit(set_self_codes, donate_argnums=(0,))


# The per-slice append runs as THREE tiny dispatches (read slice / patch
# slice / write back) so every step aliases trivially: a single fused
# program cannot prove the slice-read / in-place-write aliasing and plans
# table-sized copies (observed 17-29GB transients for a 6.1GB table).


@partial(jax.jit, static_argnames=("lo", "hi"))
def _read_slice(rows, *, lo, hi):
    return jax.lax.slice(rows, (lo, 0), (hi, 128))


@partial(
    jax.jit,
    static_argnames=("lo", "id_s", "nsec", "dp"),
    donate_argnums=(0,),
)
def _patch_slice(sl, base, slot_s, id_w, aux_w, code_w,
                 *, lo, id_s, nsec, dp):
    srows = sl.shape[0]
    nsw = srows * 32
    words = jax.lax.bitcast_convert_type(
        sl.reshape(srows, 32, 4), jnp.int32
    ).reshape(nsw)
    off = lo * 32

    def rel(i):
        # negative indices WRAP in jnp indexing; route out-of-slice writes
        # to an always-OOB positive index so mode="drop" drops them
        r = i - off
        return jnp.where((r >= 0) & (r < nsw), r, nsw)

    words = words.at[rel(base + slot_s)].set(id_w, mode="drop")
    words = words.at[rel(base + id_s * 32 + slot_s)].set(aux_w, mode="drop")
    kw = jnp.arange(dp // 4, dtype=jnp.int32)[None, :]
    cw_idx = (base + 2 * id_s * 32 + slot_s * (dp // 4))[:, None] + kw
    words = words.at[rel(cw_idx).reshape(-1)].set(
        code_w.reshape(-1), mode="drop"
    )
    return jax.lax.bitcast_convert_type(
        words.reshape(srows, 32), jnp.int8
    ).reshape(srows, 128)


@partial(jax.jit, static_argnames=("lo",), donate_argnums=(0,))
def _write_slice(rows, patched, *, lo):
    return jax.lax.dynamic_update_slice(rows, patched, (lo, 0))


def _append_slice(rows, base, slot_s, id_w, aux_w, code_w,
                  *, lo, hi, id_s, nsec, dp):
    sl = _read_slice(rows, lo=lo, hi=hi)
    patched = _patch_slice(
        sl, base, slot_s, id_w, aux_w, code_w,
        lo=lo, id_s=id_s, nsec=nsec, dp=dp,
    )
    return _write_slice(rows, patched, lo=lo)


@partial(jax.jit, static_argnames=("nsec",))
def _append_prep(self_codes, self_aux, tgt, slot, src, ok, nsec: int):
    cap = self_codes.shape[0]
    dp = self_codes.shape[1]
    e = tgt.shape[0]
    codes = self_codes[jnp.clip(src, 0, cap - 1)]
    aux = self_aux[jnp.clip(src, 0, cap - 1)]
    slot_s = jnp.where(ok, slot, 0).astype(jnp.int32)
    tgt_s = jnp.where(ok, tgt, cap).astype(jnp.int32)
    base = tgt_s * (nsec * 32)
    id_w = jnp.asarray(src, jnp.int32)
    aux_w = jax.lax.bitcast_convert_type(aux, jnp.int32)
    code_w = jax.lax.bitcast_convert_type(
        codes.reshape(e, dp // 4, 4), jnp.int32
    )
    return base, slot_s, id_w, aux_w, code_w


def append_edges_deferred(
    packed: PackedState, tgt, slot, src, ok, *,
    slice_bytes: int = 1 << 29,  # 512MB: bounds the in-flight transient
                                 # (2GB+ bitcasts also crash the compiler)
) -> PackedState:
    """Host-driven backedge append: word scatters over <=slice_bytes table
    slices, donated jit dispatches per slice (see `_patch_slice`).  The TPU
    production append path; CPU falls back to `append_edges`.

    When `tgt` is sorted ascending (the build's backedge job is), each
    slice only scatters its own contiguous edge segment (host searchsorted
    + power-of-two bucketed dynamic_slice; edges sliced beyond the segment
    point at other slices' rows and are dropped by the bounds mask)."""
    if jax.default_backend() != "tpu" or packed.dp % 4 != 0:
        return append_edges(packed, tgt, slot, src, ok)
    nsec = packed.nsec
    tgt = jnp.asarray(tgt, jnp.int32)
    base, slot_s, id_w, aux_w, code_w = _append_prep(
        packed.self_codes, packed.self_aux,
        tgt, jnp.asarray(slot, jnp.int32),
        jnp.asarray(src, jnp.int32), jnp.asarray(ok), nsec,
    )
    rows = packed.rows
    r_sec = rows.shape[0]
    e = tgt.shape[0]
    n_slices = max(1, -(-(r_sec * 128) // slice_bytes))
    # slice boundaries at whole logical rows so a target's sectors never
    # straddle slices
    srows = -(-(-(-r_sec // n_slices)) // nsec) * nsec

    # raw sorted targets partition the edges; edges with ok=False write only
    # the sacrificial dump row, so skipping them when their raw target lands
    # in another slice's segment is harmless
    tgt_np = np.asarray(tgt)
    sorted_ok = bool((np.diff(tgt_np) >= 0).all())
    # barrier: don't stack the slice transients on top of the (possibly
    # still-executing) producer's peak
    np.asarray(rows[:1, :1])

    for s in range(0, r_sec, srows):
        lo, hi = s, min(s + srows, r_sec)
        if sorted_ok and e > 16384:
            t_lo, t_hi = lo // nsec, -(-hi // nsec)
            e_lo = int(np.searchsorted(tgt_np, t_lo, side="left"))
            e_hi = int(np.searchsorted(tgt_np, t_hi, side="left"))
            if e_hi == e_lo:
                continue
            blen = max(8192, 1 << (e_hi - e_lo - 1).bit_length())
            blen = min(blen, e)
            st = min(e_lo, e - blen)
            args = tuple(
                jax.lax.dynamic_slice(a, (st,) + (0,) * (a.ndim - 1),
                                      (blen,) + a.shape[1:])
                for a in (base, slot_s, id_w, aux_w, code_w)
            )
        else:
            args = (base, slot_s, id_w, aux_w, code_w)
        rows = _append_slice(
            rows, *args,
            lo=lo, hi=hi, id_s=packed.id_secs, nsec=nsec, dp=packed.dp,
        )
        # serialize slices: dispatch is async and output buffers are
        # allocated at enqueue time, so unsynced slices would hold ALL
        # their ~2.5GB transients concurrently (observed OOM).  A tiny
        # device->host fetch is the only real barrier on the axon backend.
        np.asarray(rows[:1, :1])
    return packed._replace(rows=rows)


def append_edges(packed: PackedState, tgt, slot, src, ok) -> PackedState:
    """Splice src's (id, aux, code) into (tgt, slot) — the backedge fast path.

    2-D byte scatters into the [cap1*nsec, 128] sector table; each write
    lands inside one sector (dp divides 128; ids/aux are 4-byte aligned),
    so row/col indices stay affine per chunk."""
    cap = packed.self_codes.shape[0]
    dp = packed.dp
    id_s = packed.id_secs
    nsec = packed.nsec
    e = tgt.shape[0]
    codes = packed.self_codes[jnp.clip(src, 0, cap - 1)]      # [E, dp]
    aux = packed.self_aux[jnp.clip(src, 0, cap - 1)]          # [E]
    id_bytes = _i32_to_bytes(jnp.asarray(src, jnp.int32)[:, None])   # [E, 4]
    aux_bytes = _f32_to_bytes(aux[:, None])                          # [E, 4]

    slot_s = jnp.where(ok, slot, 0)
    tgt_s = jnp.where(ok, tgt, cap)   # cap = the sacrificial dump row

    import os

    # TPU fast path: flat int32 WORD scatters (sliced, one donated dispatch
    # per slice).  XLA's 2-D column-indexed i8 scatters serialize
    # (~2.5us/index; 4s/batch at E=512k on v5e) while flat scalar/affine
    # word scatters run ~100ns/index (measured 60-87ms at E=512k).
    if (
        jax.default_backend() == "tpu"
        and dp % 4 == 0
        and os.environ.get("DISKANN_NO_WORD_APPEND") != "1"
        and not isinstance(packed.rows, jax.core.Tracer)  # not under a jit
    ):
        return append_edges_deferred(packed, tgt, slot, src, ok)

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

    cpl = 128 // dp                        # codes per sector
    spl = 32                               # id/aux cells per sector (4B each)

    def body(i, acc):
        t = jax.lax.dynamic_slice(tgt_s, (i * ch,), (ch,))
        s = jax.lax.dynamic_slice(slot_s, (i * ch,), (ch,))
        ib = jax.lax.dynamic_slice(id_bytes, (i * ch, 0), (ch, 4))
        ab = jax.lax.dynamic_slice(aux_bytes, (i * ch, 0), (ch, 4))
        cd = jax.lax.dynamic_slice(codes, (i * ch, 0), (ch, dp))
        base = t * nsec

        def sc(a, srow, cols, vals):
            r2 = jnp.broadcast_to(srow[:, None], cols.shape)
            return a.at[r2, cols].set(vals, mode="drop")

        acc = sc(acc, base + s // spl, (s % spl)[:, None] * 4 + b4, ib)
        acc = sc(acc, base + id_s + s // spl, (s % spl)[:, None] * 4 + b4, ab)
        acc = sc(
            acc, base + 2 * id_s + s // cpl, (s % cpl)[:, None] * dp + bd, cd
        )
        return acc

    rows_t = jax.lax.fori_loop(0, n_chunks, body, packed.rows)
    return packed._replace(rows=rows_t)
