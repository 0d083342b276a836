"""Fused fat-row expand: pipelined sector DMAs + in-VMEM int8 scoring.

The packed beam expansion gathers one fat row per beam node
(`graph/packed.py`: [ids | aux | codes] as a run of nsec 128-byte sectors)
and scores all its neighbors' int8 codes against the query.  XLA's gather
materializes the gathered block to HBM and the dot re-reads it — measured
4.6 ms/hop at [B=4096, W=4, R=84, dp=64] on v5e where the roofline is
~0.3 ms.  This kernel does the whole expansion in one pass, measured at
2.3 ms/hop on the same shape:

- beam ids arrive via scalar prefetch (SMEM);
- fat rows stream HBM -> VMEM as [nsec, 128] DMAs at nsec-aligned row
  offsets (the shape Mosaic accepts; [1, nsec*128] slices of a 2-D table
  are rejected), manually pipelined in waves of 64 rows, double-buffered;
- each wave's int8 code sectors are scored in VMEM the moment they land
  (multiply + masked lane-sums, f32 accumulate — exact for |codes| <= 127
  products summed over <= 2^13 terms); the gathered bytes never
  round-trip through HBM;
- outputs are the raw [ids|aux] header sectors (decoded outside with two
  bitcasts) and the int32 dot products (scaled outside).

A wave's buffer slot is refilled only AFTER its bytes are consumed —
issuing the refill first races the DMA against the compute (caught by the
interpret-mode parity test, where DMAs complete synchronously).

The pure-XLA equivalent (`fatrow_expand_ref`) is the test oracle and the
CPU fallback.  Reference analogue: the SSD tier's sector read + PQ scoring
per beam node (`diskann-disk/src/search/provider/disk_provider.rs:683`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diskann_tpu.graph.packed import id_sectors, n_sectors

WAVE = 64          # rows per pipeline wave
N_BUF_WAVES = 2    # waves resident in VMEM


def _kernel(rp: int, dp: int, nrows: int,
            beam_ref, rows_hbm, qiw_ref, hdr_ref, dots_ref, buf, sem):
    i = pl.program_id(0)
    base = i * nrows
    nwaves = nrows // WAVE
    id_s = id_sectors(rp)
    nsec = n_sectors(rp, dp)
    hdr_secs = 2 * id_s
    ncode = nsec - hdr_secs
    cpl = 128 // dp                        # codes per sector

    def dma(j, slot):
        row = jnp.maximum(beam_ref[base + j], 0)
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(row * nsec, nsec), :],
            buf.at[pl.ds(slot * nsec, nsec), :],
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

    lanes3 = jax.lax.broadcasted_iota(jnp.int32, (WAVE, ncode, 128), 2)

    def wave_body(wi, _):
        off = jnp.mod(wi, N_BUF_WAVES) * WAVE

        def wt(j, _):
            dma(wi * WAVE + j, off + j).wait()
            return 0

        jax.lax.fori_loop(0, WAVE, wt, 0)

        flat = buf[pl.ds(off * nsec, WAVE * nsec), :]        # [W*nsec, 128]
        b3 = flat.reshape(WAVE, nsec, 128)                   # major split
        hdr_ref[pl.ds(wi * WAVE, WAVE), :, :] = b3[:, :hdr_secs, :]
        codes = b3[:, hdr_secs:, :].astype(jnp.int32)        # [W, ncode, 128]
        q = qiw_ref[pl.ds(wi * WAVE, WAVE), :].astype(jnp.int32)  # [W, dp]
        q2 = jnp.concatenate([q] * cpl, axis=1)              # [W, 128]
        q3 = jnp.broadcast_to(q2.reshape(WAVE, 1, 128), (WAVE, ncode, 128))
        prod = (codes * q3).astype(jnp.float32)
        for t in range(cpl):  # static unroll: one masked lane-sum per block
            blk = (lanes3 // dp) == t
            dt = jnp.sum(jnp.where(blk, prod, 0.0), axis=2)  # [W, ncode]
            dots_ref[pl.ds(wi * WAVE, WAVE), pl.ds(t * ncode, ncode)] = (
                dt.astype(jnp.int32)
            )

        # refill this wave's slot only AFTER its bytes were consumed above —
        # issuing before the reads races the refill DMA against the compute
        # (slot parity (wi+N_BUF_WAVES)%N_BUF_WAVES == wi%N_BUF_WAVES)
        @pl.when(wi + N_BUF_WAVES < nwaves)
        def _():
            issue_wave(wi + N_BUF_WAVES)

        return 0

    jax.lax.fori_loop(0, nwaves, wave_body, 0)


@functools.partial(
    jax.jit, static_argnames=("rp", "dp", "block_rows", "interpret")
)
def fatrow_expand(rows, beam_flat, qiw, *, rp: int, dp: int,
                  block_rows: int = 512, interpret: bool = False):
    """rows [(cap+1)*nsec, 128] i8 sector table; beam_flat [B*W] i32; qiw
    [B*W, dp] i8 (query codes repeated per beam slot).  Returns
    (hdr [B*W, 2*id_secs*128] i8, dots [B*W, ncode*cpl] i32 in neighbor-slot
    order).  B*W must be a multiple of `block_rows` (itself a multiple of
    WAVE); invalid beam ids must be pre-clamped semantics-wise by the
    caller (they are clamped to row 0 here and masked outside)."""
    bw = beam_flat.shape[0]
    assert bw % block_rows == 0 and block_rows % WAVE == 0, (bw, block_rows)
    id_s = id_sectors(rp)
    nsec = n_sectors(rp, dp)
    assert 128 % dp == 0, dp
    hdr_secs = 2 * id_s
    ncode = nsec - hdr_secs
    cpl = 128 // dp
    grid = (bw // block_rows,)

    kern = functools.partial(_kernel, rp, dp, block_rows)
    hdr, dots = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),            # rows (HBM)
                pl.BlockSpec((block_rows, dp), lambda i, *_: (i, 0)),  # qiw
            ],
            out_specs=[
                pl.BlockSpec(
                    (block_rows, hdr_secs, 128), lambda i, *_: (i, 0, 0)
                ),
                pl.BlockSpec((block_rows, cpl * ncode), lambda i, *_: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((N_BUF_WAVES * WAVE * nsec, 128), jnp.int8),
                pltpu.SemaphoreType.DMA((N_BUF_WAVES * WAVE,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bw, hdr_secs, 128), jnp.int8),
            jax.ShapeDtypeStruct((bw, cpl * ncode), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(beam_flat, rows, qiw)
    # kernel emits dots grouped by lane block [cpl, ncode]; neighbor slot
    # j = sec*cpl + t, so interleave to slot order outside (cheap XLA)
    dots = dots.reshape(bw, cpl, ncode).transpose(0, 2, 1).reshape(
        bw, ncode * cpl
    )
    return hdr.reshape(bw, hdr_secs * 128), dots


@functools.partial(jax.jit, static_argnames=("rp", "dp"))
def fatrow_expand_ref(rows, beam_flat, qiw, *, rp: int, dp: int):
    """Pure-XLA oracle / CPU fallback with identical outputs."""
    id_s = id_sectors(rp)
    nsec = n_sectors(rp, dp)
    hdr_secs = 2 * id_s
    ncode = nsec - hdr_secs
    cpl = 128 // dp
    n = rows.shape[0] // nsec
    bw = beam_flat.shape[0]
    safe = jnp.clip(beam_flat, 0, n - 1)
    idx = safe[:, None] * nsec + jnp.arange(nsec, dtype=jnp.int32)[None, :]
    fat = rows[idx]                                          # [BW, nsec, 128]
    hdr = fat[:, :hdr_secs, :].reshape(bw, hdr_secs * 128)
    codes = fat[:, hdr_secs:, :].reshape(bw, ncode * 128)
    c3 = codes.reshape(bw, ncode * cpl, dp).astype(jnp.int32)
    d = jnp.sum(c3 * qiw.astype(jnp.int32)[:, None, :], axis=-1)
    return hdr, d.astype(jnp.int32)
