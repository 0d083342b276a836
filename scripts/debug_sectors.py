"""Debug the sector expand kernel: tiny sizes, mismatch structure.

Run CPU interpret:  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/debug_sectors.py
Run TPU:            PYTHONPATH=/root/repo:/root/.axon_site python scripts/debug_sectors.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import scripts.profile_sectors as ps

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)


def main():
    ps.N = 4096  # patch module-level N used by sector_expand_ref
    n = ps.N
    B, W, DP, NSEC = 512, 1, ps.DP, ps.NSEC
    key = jax.random.key(3)
    rows_sec = jax.random.randint(
        key, (n * NSEC, 128), -127, 128, dtype=jnp.int8
    )
    beam = jax.random.randint(key, (B * W,), 0, n, dtype=jnp.int32)
    qiw = jax.random.randint(key, (B * W, DP), -127, 128, dtype=jnp.int8)

    interp = jax.default_backend() != "tpu"
    LOG(f"[dbg] backend={jax.default_backend()} interpret={interp}")

    if interp:
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def sector_expand_interp(rows_sec, beam_flat, qiw):
            bw = beam_flat.shape[0]
            ncode = NSEC - ps.SEC_CODE
            return pl.pallas_call(
                ps._kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(bw // ps.BLOCK,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.ANY),
                        pl.BlockSpec((ps.BLOCK, DP), lambda i, *_: (i, 0)),
                    ],
                    out_specs=[
                        pl.BlockSpec((ps.BLOCK, 2 * ps.SEC_AUX, 128),
                                     lambda i, *_: (i, 0, 0)),
                        pl.BlockSpec((ps.BLOCK, ncode), lambda i, *_: (i, 0)),
                        pl.BlockSpec((ps.BLOCK, ncode), lambda i, *_: (i, 0)),
                    ],
                    scratch_shapes=[
                        pltpu.VMEM((ps.NBUF * ps.WAVE * NSEC, 128), jnp.int8),
                        pltpu.SemaphoreType.DMA((ps.NBUF * ps.WAVE,)),
                    ],
                ),
                out_shape=[
                    jax.ShapeDtypeStruct((bw, 2 * ps.SEC_AUX, 128), jnp.int8),
                    jax.ShapeDtypeStruct((bw, ncode), jnp.int32),
                    jax.ShapeDtypeStruct((bw, ncode), jnp.int32),
                ],
                interpret=True,
            )(beam_flat, rows_sec, qiw)

        hk = sector_expand_interp(rows_sec, beam, qiw)
    else:
        hk = ps.sector_expand(rows_sec, beam, qiw)
    hr = ps.sector_expand_ref(rows_sec, beam, qiw)

    for name, a, b in zip(("hdr", "de", "do"), hk, hr):
        an, bn = np.asarray(a), np.asarray(b)
        ok = (an == bn).all()
        LOG(f"[dbg] {name}: match={ok}")
        if not ok:
            bad = np.nonzero(~np.all((an == bn).reshape(an.shape[0], -1), axis=1))[0]
            LOG(f"[dbg]   mismatched rows: {len(bad)}/{an.shape[0]}; first: {bad[:8]}")
            r0 = bad[0]
            LOG(f"[dbg]   row {r0} beam={np.asarray(beam)[r0]}")
            if name == "hdr":
                am, bm = an[r0], bn[r0]
                secbad = np.nonzero(~np.all(am == bm, axis=1))[0]
                LOG(f"[dbg]   bad sectors within row: {secbad}")
                LOG(f"[dbg]   kernel sec{secbad[0]} first16: {am[secbad[0]][:16]}")
                LOG(f"[dbg]   oracle sec{secbad[0]} first16: {bm[secbad[0]][:16]}")
                # is the kernel row actually some OTHER node's row?
                rows_np = np.asarray(rows_sec).reshape(n, NSEC, 128)
                hdrs = rows_np[:, : 2 * ps.SEC_AUX, :]
                eq = np.all(hdrs == am[None], axis=(1, 2))
                LOG(f"[dbg]   kernel hdr equals node(s): {np.nonzero(eq)[0][:4]}")
            else:
                LOG(f"[dbg]   kernel: {an[r0][:8]}")
                LOG(f"[dbg]   oracle: {bn[r0][:8]}")
    print("DONE")


if __name__ == "__main__":
    main()
