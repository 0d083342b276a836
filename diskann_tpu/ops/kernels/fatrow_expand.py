"""Fused fat-row expand: pipelined word-row DMAs + in-VMEM int8 scoring.

The packed beam expansion gathers one fat row per beam node
(`graph/packed.py`: [ids | aux | codes] as a run of nwr 128-word int32
rows) and scores all its neighbors' int8 codes against the query.  XLA's
gather materializes the gathered block to HBM and the dot re-reads it —
measured 4.6 ms/hop at [B=4096, W=4, R=84, dp=64] on v5e where the fused
kernel runs 2.3 ms.  The kernel:

- receives beam ids via scalar prefetch (SMEM);
- streams fat rows HBM -> VMEM as [nwr, 128] int32 DMAs at nwr-aligned
  row offsets (nwr % 8 == 0 — the shape Mosaic accepts), manually
  pipelined in waves of 64 rows, double-buffered;
- unpacks each wave's int8 codes from words with four arithmetic shifts
  and scores them in VMEM the moment they land (multiply + masked
  lane-sums, f32 accumulate — exact for |codes| <= 127 summed over <=
  2^13 terms); the gathered words never round-trip through HBM;
- outputs the raw id/aux word rows (ids ARE int32; aux is one bitcast
  outside) and the int32 dot products (scaled outside).

A wave's buffer slot is refilled only AFTER its words are consumed —
issuing the refill first races the DMA against the compute (caught by the
interpret-mode parity test, where DMAs complete synchronously).

Word layout recap: code j occupies words [j*dpw, (j+1)*dpw) of the code
section (dpw = dp/4 divides 128), i.e. word-row j // cpr at lane block
j % cpr, cpr = 128/dpw codes per row; byte p of a word is dim 4k+p of
the code (little-endian).

The pure-XLA equivalent (`fatrow_expand_ref`) is the test oracle and the
CPU fallback.  Reference analogue: the SSD tier's sector read + PQ
scoring per beam node (`diskann-disk/.../disk_provider.rs:683`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diskann_tpu.graph.packed import (
    code_wrows, id_wrows, n_wrows, words_to_codes,
)

WAVE = 64          # rows per pipeline wave
N_BUF_WAVES = 2    # waves resident in VMEM


def _kernel(rp: int, dp: int, nrows: int,
            beam_ref, rows_hbm, q0, q1, q2, q3,
            ids_ref, aux_ref, dots_ref, buf, sem):
    i = pl.program_id(0)
    base = i * nrows
    nwaves = nrows // WAVE
    idw = id_wrows(rp)
    nwr = n_wrows(rp, dp)
    codr = code_wrows(rp, dp)
    dpw = dp // 4
    cpr = 128 // dpw                      # codes per word-row

    def dma(j, slot):
        row = jnp.maximum(beam_ref[base + j], 0)
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(row * nwr, nwr), :],
            buf.at[pl.ds(slot * nwr, nwr), :],
            sem.at[slot],
        )

    def issue_wave(wi):
        def b(j, _):
            slot = jnp.mod(wi, N_BUF_WAVES) * WAVE + j
            dma(wi * WAVE + j, slot).start()
            return 0

        jax.lax.fori_loop(0, WAVE, b, 0)

    issue_wave(0)

    @pl.when(nwaves > 1)
    def _():
        issue_wave(1)

    lanes3 = jax.lax.broadcasted_iota(jnp.int32, (WAVE, codr, 128), 2)
    qplanes = (q0, q1, q2, q3)

    def wave_body(wi, _):
        off = jnp.mod(wi, N_BUF_WAVES) * WAVE

        def wt(j, _):
            dma(wi * WAVE + j, off + j).wait()
            return 0

        jax.lax.fori_loop(0, WAVE, wt, 0)

        flat = buf[pl.ds(off * nwr, WAVE * nwr), :]          # [W*nwr, 128]
        b3 = flat.reshape(WAVE, nwr, 128)                    # major split
        ids_ref[pl.ds(wi * WAVE, WAVE), :, :] = b3[:, :idw, :]
        aux_ref[pl.ds(wi * WAVE, WAVE), :, :] = b3[:, idw : 2 * idw, :]
        words = b3[:, 2 * idw : 2 * idw + codr, :]           # [W, codr, 128]
        acc = jnp.zeros((WAVE, codr, 128), jnp.int32)
        for p in range(4):  # unpack byte plane p (little-endian)
            plane = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(words, 24 - 8 * p), 24
            )
            qp = qplanes[p][pl.ds(wi * WAVE, WAVE), :].astype(jnp.int32)
            acc = acc + plane * qp[:, None, :]
        prod = acc.astype(jnp.float32)
        for t in range(cpr):  # static unroll: one masked lane-sum per block
            blk = (lanes3 // dpw) == t
            dt = jnp.sum(jnp.where(blk, prod, 0.0), axis=2)  # [W, codr]
            dots_ref[pl.ds(wi * WAVE, WAVE), pl.ds(t * codr, codr)] = (
                dt.astype(jnp.int32)
            )

        # refill this wave's slot only AFTER its words were consumed above —
        # issuing before the reads races the refill DMA against the compute
        # (slot parity (wi+N_BUF_WAVES)%N_BUF_WAVES == wi%N_BUF_WAVES)
        @pl.when(wi + N_BUF_WAVES < nwaves)
        def _():
            issue_wave(wi + N_BUF_WAVES)

        return 0

    jax.lax.fori_loop(0, nwaves, wave_body, 0)


def _query_planes(qiw, dp: int):
    """[BW, dp] i8 query codes -> four [BW, 128] i8 byte-plane operands.

    The code words of one 128-word row hold cpr codes of dpw words each;
    lane l serves code l // dpw, word l % dpw, so byte plane p of lane l
    multiplies query dim 4*(l % dpw) + p."""
    dpw = dp // 4
    lane_word = jnp.arange(128, dtype=jnp.int32) % dpw
    return tuple(
        qiw[:, 4 * lane_word + p] for p in range(4)
    )


@functools.partial(
    jax.jit, static_argnames=("rp", "dp", "block_rows", "interpret")
)
def fatrow_expand(rows, beam_flat, qiw, *, rp: int, dp: int,
                  block_rows: int = 512, interpret: bool = False):
    """rows [(cap+1)*nwr, 128] i32 word table; beam_flat [B*W] i32; qiw
    [B*W, dp] i8 (query codes repeated per beam slot).  Returns
    (ids [B*W, idw*128] i32, aux_w [B*W, idw*128] i32 f32-bits, dots
    [B*W, codr*cpr] i32 in neighbor-slot order).  B*W must be a multiple
    of `block_rows` (itself a multiple of WAVE); invalid beam ids must be
    pre-clamped semantics-wise by the caller (they are clamped to row 0
    here and masked outside)."""
    bw = beam_flat.shape[0]
    assert bw % block_rows == 0 and block_rows % WAVE == 0, (bw, block_rows)
    idw = id_wrows(rp)
    nwr = n_wrows(rp, dp)
    codr = code_wrows(rp, dp)
    dpw = dp // 4
    assert dp % 4 == 0 and 128 % dpw == 0, dp
    cpr = 128 // dpw
    grid = (bw // block_rows,)

    q0, q1, q2, q3 = _query_planes(qiw, dp)
    kern = functools.partial(_kernel, rp, dp, block_rows)
    qspec = pl.BlockSpec((block_rows, 128), lambda i, *_: (i, 0))
    ids, aux_w, dots = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),               # rows (HBM)
                qspec, qspec, qspec, qspec,                      # query planes
            ],
            out_specs=[
                pl.BlockSpec((block_rows, idw, 128), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((block_rows, idw, 128), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((block_rows, cpr * codr), lambda i, *_: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((N_BUF_WAVES * WAVE * nwr, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((N_BUF_WAVES * WAVE,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bw, idw, 128), jnp.int32),
            jax.ShapeDtypeStruct((bw, idw, 128), jnp.int32),
            jax.ShapeDtypeStruct((bw, cpr * codr), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(beam_flat, rows, q0, q1, q2, q3)
    # kernel emits dots grouped by lane block [cpr, codr]; neighbor slot
    # j = wordrow*cpr + block, so interleave to slot order outside
    dots = dots.reshape(bw, cpr, codr).transpose(0, 2, 1).reshape(
        bw, codr * cpr
    )
    return ids.reshape(bw, idw * 128), aux_w.reshape(bw, idw * 128), dots


@functools.partial(jax.jit, static_argnames=("rp", "dp"))
def fatrow_expand_ref(rows, beam_flat, qiw, *, rp: int, dp: int):
    """Pure-XLA oracle / CPU fallback with identical outputs."""
    idw = id_wrows(rp)
    nwr = n_wrows(rp, dp)
    codr = code_wrows(rp, dp)
    dpw = dp // 4
    cpr = 128 // dpw
    n = rows.shape[0] // nwr
    bw = beam_flat.shape[0]
    safe = jnp.clip(beam_flat, 0, n - 1)
    idx = safe[:, None] * nwr + jnp.arange(nwr, dtype=jnp.int32)[None, :]
    fat = rows[idx]                                          # [BW, nwr, 128]
    ids = fat[:, :idw, :].reshape(bw, idw * 128)
    aux_w = fat[:, idw : 2 * idw, :].reshape(bw, idw * 128)
    words = fat[:, 2 * idw : 2 * idw + codr, :].reshape(bw, codr * 128)
    codes = words_to_codes(words, codr * 512).reshape(
        bw, codr * cpr, dp
    ).astype(jnp.int32)
    d = jnp.sum(codes * qiw.astype(jnp.int32)[:, None, :], axis=-1)
    return ids, aux_w, d.astype(jnp.int32)
