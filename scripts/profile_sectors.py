"""Sector-table expand kernel experiment (self-contained; library untouched).

Layout under test: the fat-row table stored as [N*48, 128] int8 "sectors"
with sector-aligned sections per logical row:
  sectors 0-2  ids   (rp*4 = 336 bytes used)
  sectors 3-5  aux   (336 bytes)
  sectors 6-47 codes (rp*dp = 5376 bytes)
A fat row is then a [48, 128] HBM slice at a 48-aligned row offset — the
shape Mosaic's (8, 128) tiling accepts for DMA (a [1, 6144] slice of the
2-D table is rejected: dim0 slices must be 8-aligned).

Measures:
  1. kernel parity vs a pure-XLA oracle;
  2. kernel ms/hop vs the XLA fat-row gather (current production path);
  3. the XLA fallback gather cost ON the sector table (lax.gather with
     slice_sizes (48, 128)).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_sectors.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/diskann_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)

N = int(os.environ.get("PS_N", 1_000_000))
B, W, RP, DP = 4096, 4, 84, 64
NSEC = 48
SEC_IDS, SEC_AUX, SEC_CODE = 0, 3, 6
WAVE = 64
NBUF = 2
BLOCK = 512
ITERS = 24


def _kernel(beam_ref, rows_hbm, qiw_ref, hdr_ref, de_ref, do_ref, buf, sem):
    i = pl.program_id(0)
    base = i * BLOCK
    nwaves = BLOCK // WAVE

    def dma(j, slot):
        row = jnp.maximum(beam_ref[base + j], 0)
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(row * NSEC, NSEC), :],
            buf.at[pl.ds(slot * NSEC, NSEC), :],
            sem.at[slot],
        )

    def issue_wave(wi):
        def bfn(j, _):
            slot = jnp.mod(wi, NBUF) * WAVE + j
            dma(wi * WAVE + j, slot).start()
            return 0

        jax.lax.fori_loop(0, WAVE, bfn, 0)

    issue_wave(0)

    @pl.when(nwaves > 1)
    def _():
        issue_wave(1)

    ncode = NSEC - SEC_CODE
    lanes3 = jax.lax.broadcasted_iota(jnp.int32, (WAVE, ncode, 128), 2)
    left3 = lanes3 < 64                          # [W, 42, 128] bool

    def wave_body(wi, _):
        off = jnp.mod(wi, NBUF) * WAVE

        def wt(j, _):
            dma(wi * WAVE + j, off + j).wait()
            return 0

        jax.lax.fori_loop(0, WAVE, wt, 0)

        flat = buf[pl.ds(off * NSEC, WAVE * NSEC), :]        # [W*48, 128]
        b3 = flat.reshape(WAVE, NSEC, 128)                   # major split
        hdr_ref[pl.ds(wi * WAVE, WAVE), :, :] = b3[:, : 2 * SEC_AUX, :]
        codes = b3[:, SEC_CODE:, :].astype(jnp.int32)        # [W, 42, 128]
        q = qiw_ref[pl.ds(wi * WAVE, WAVE), :].astype(jnp.int32)
        q2 = jnp.concatenate([q, q], axis=1)                 # [W, 128]
        q3 = jnp.broadcast_to(
            q2.reshape(WAVE, 1, 128), (WAVE, NSEC - SEC_CODE, 128)
        )
        prod = (codes * q3).astype(jnp.float32)
        de = jnp.sum(jnp.where(left3, prod, 0.0), axis=2)    # [W, 42]
        do = jnp.sum(jnp.where(left3, 0.0, prod), axis=2)
        de_ref[pl.ds(wi * WAVE, WAVE), :] = de.astype(jnp.int32)
        do_ref[pl.ds(wi * WAVE, WAVE), :] = do.astype(jnp.int32)

        # refill this wave's slot only AFTER its bytes were consumed above —
        # issuing before the reads races the DMA against the compute
        # (slot parity (wi+NBUF)%NBUF == wi%NBUF)
        @pl.when(wi + NBUF < nwaves)
        def _():
            issue_wave(wi + NBUF)

        return 0

    jax.lax.fori_loop(0, nwaves, wave_body, 0)


@jax.jit
def sector_expand(rows_sec, beam_flat, qiw):
    bw = beam_flat.shape[0]
    ncode = NSEC - SEC_CODE
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bw // BLOCK,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((BLOCK, DP), lambda i, *_: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((BLOCK, 2 * SEC_AUX, 128), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((BLOCK, ncode), lambda i, *_: (i, 0)),
                pl.BlockSpec((BLOCK, ncode), lambda i, *_: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((NBUF * WAVE * NSEC, 128), jnp.int8),
                pltpu.SemaphoreType.DMA((NBUF * WAVE,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bw, 2 * SEC_AUX, 128), jnp.int8),
            jax.ShapeDtypeStruct((bw, ncode), jnp.int32),
            jax.ShapeDtypeStruct((bw, ncode), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(beam_flat, rows_sec, qiw)


@jax.jit
def sector_expand_ref(rows_sec, beam_flat, qiw):
    safe = jnp.clip(beam_flat, 0, N - 1)
    idx = safe[:, None] * NSEC + jnp.arange(NSEC, dtype=jnp.int32)[None, :]
    fat = rows_sec[idx]                                    # [BW, 48, 128]
    hdr = fat[:, : 2 * SEC_AUX, :]
    codes = fat[:, SEC_CODE:, :].astype(jnp.int32)         # [BW, 42, 128]
    q = qiw.astype(jnp.int32)
    q2 = jnp.concatenate([q, q], axis=1)[:, None, :]       # [BW, 1, 128]
    prod = codes * q2
    de = prod[:, :, :64].sum(axis=-1)
    do = prod[:, :, 64:].sum(axis=-1)
    return hdr, de.astype(jnp.int32), do.astype(jnp.int32)


def main():
    LOG(f"[ps] backend={jax.default_backend()} N={N}")
    key = jax.random.key(9)
    gen = jax.jit(lambda k: jax.random.randint(
        k, (N // 8 * NSEC, 128), -127, 128, dtype=jnp.int8))
    rows_sec = jnp.concatenate(
        [gen(jax.random.fold_in(key, i)) for i in range(8)], axis=0
    )
    beam = jax.random.randint(key, (B * W,), 0, N, dtype=jnp.int32)
    qiw = jax.random.randint(key, (B * W, DP), -127, 128, dtype=jnp.int8)
    np.asarray(rows_sec[:1, :1])

    hk = sector_expand(rows_sec, beam, qiw)
    hr = sector_expand_ref(rows_sec, beam, qiw)
    ok = all(bool((np.asarray(a) == np.asarray(b)).all()) for a, b in zip(hk, hr))
    LOG(f"[ps] parity: {ok}")
    if not ok:
        for name, a, b in zip(("hdr", "de", "do"), hk, hr):
            an, bn = np.asarray(a), np.asarray(b)
            LOG(f"[ps]  {name}: match={(an == bn).all()}")
        print("PARITY FAIL")
        return

    def chain(fn):
        def run(rows_sec, beam0, qiw):
            def body(carry, _):
                bm, acc = carry
                hdr, de, do = fn(rows_sec, bm, qiw)
                nxt = jnp.abs(de[:, 0] + bm) % N
                return (nxt.astype(jnp.int32),
                        acc + do[:, 0].astype(jnp.float32) * 1e-30), None
            (bm, acc), _ = jax.lax.scan(
                body, (beam0, jnp.zeros((B * W,), jnp.float32)),
                None, length=ITERS,
            )
            return acc
        return jax.jit(run)

    for name, fn in (("sec_kernel", sector_expand),
                     ("sec_xla", sector_expand_ref)):
        cf = chain(fn)
        t0 = time.time()
        out = cf(rows_sec, beam, qiw)
        np.asarray(out[:1])
        first = time.time() - t0
        t0 = time.time()
        out = cf(rows_sec, beam, qiw)
        np.asarray(out[:1])
        dt = time.time() - t0
        LOG(f"[ps] {name:10s} {dt/ITERS*1e3:8.3f} ms/hop (first {first:.0f}s)")
    print("DONE")


if __name__ == "__main__":
    main()
