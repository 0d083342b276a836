"""Microbench: backedge append into the fat-row table at build scale.

Variants at cap=1M, E=524288 (one 8192-insert batch's backedges):
  window  — lax.scatter with [E, 2] indices + contiguous update windows
  affine  — .at[rows2d, cols].set with affine-iota per-byte columns
  rowrmw  — gather whole target rows, overlay in registers, write rows back

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_append.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/diskann_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)

CAP = int(os.environ.get("PA_CAP", 1_000_000))
E = int(os.environ.get("PA_E", 524_288))
RP, DP = 84, 64
ROW = -(-(RP * (8 + DP)) // 128) * 128
ITERS = 4


def run_variant(name, fn, rows, args):
    f = jax.jit(fn, donate_argnums=(0,))
    try:
        t0 = time.time()
        out = f(rows, *args)
        np.asarray(out[:1, :1])
        first = time.time() - t0
        t0 = time.time()
        for _ in range(ITERS):
            out = f(out, *args)
        np.asarray(out[:1, :1])
        dt = (time.time() - t0) / ITERS
        LOG(f"[pa] {name:8s} {dt*1e3:9.1f} ms/batch (first {first:.0f}s)")
        return out
    except Exception as ex:
        LOG(f"[pa] {name:8s} FAILED: {type(ex).__name__}: {str(ex)[:200]}")
        return rows


def main():
    LOG(f"[pa] backend={jax.default_backend()} cap={CAP} E={E} ROW={ROW}")
    key = jax.random.key(0)
    gen = jax.jit(lambda k: jax.random.randint(
        k, (CAP // 8, ROW), -127, 128, dtype=jnp.int8))
    rows0 = jnp.concatenate(
        [gen(jax.random.fold_in(key, i)) for i in range(8)], axis=0
    )
    tgt = jax.random.randint(key, (E,), 0, CAP, dtype=jnp.int32)
    slot = jax.random.randint(key, (E,), 0, RP, dtype=jnp.int32)
    id_bytes = jax.random.randint(key, (E, 4), -127, 128, dtype=jnp.int8)
    aux_bytes = jax.random.randint(key, (E, 4), -127, 128, dtype=jnp.int8)
    codes = jax.random.randint(key, (E, DP), -127, 128, dtype=jnp.int8)
    np.asarray(rows0[:1, :1])

    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1),
    )

    def window(rows, tgt, slot, id_bytes, aux_bytes, codes):
        def sw(acc, col, vals):
            idx = jnp.stack([tgt, col], axis=-1)
            return jax.lax.scatter(
                acc, idx, vals, dimension_numbers=dnums,
                mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
            )
        rows = sw(rows, slot * 4, id_bytes)
        rows = sw(rows, RP * 4 + slot * 4, aux_bytes)
        rows = sw(rows, RP * 8 + slot * DP, codes)
        return rows

    def affine(rows, tgt, slot, id_bytes, aux_bytes, codes):
        b4 = jnp.arange(4, dtype=jnp.int32)[None, :]
        bd = jnp.arange(DP, dtype=jnp.int32)[None, :]

        def sc(acc, cols, vals):
            r2 = jnp.broadcast_to(tgt[:, None], cols.shape)
            return acc.at[r2, cols].set(vals, mode="drop")
        rows = sc(rows, slot[:, None] * 4 + b4, id_bytes)
        rows = sc(rows, RP * 4 + slot[:, None] * 4 + b4, aux_bytes)
        rows = sc(rows, RP * 8 + slot[:, None] * DP + bd, codes)
        return rows

    def window_sorted(rows, tgt, slot, id_bytes, aux_bytes, codes):
        # sort edges by (tgt, slot) and promise sorted+unique indices
        lin = tgt * RP + slot
        order = jnp.argsort(lin)
        tgt_s, slot_s = tgt[order], slot[order]
        idb, axb, cds = id_bytes[order], aux_bytes[order], codes[order]

        def sw(acc, col, vals):
            idx = jnp.stack([tgt_s, col], axis=-1)
            return jax.lax.scatter(
                acc, idx, vals, dimension_numbers=dnums,
                indices_are_sorted=True, unique_indices=True,
                mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
            )
        rows = sw(rows, slot_s * 4, idb)
        rows = sw(rows, RP * 4 + slot_s * 4, axb)
        rows = sw(rows, RP * 8 + slot_s * DP, cds)
        return rows

    def affine_chunked(rows, tgt, slot, id_bytes, aux_bytes, codes):
        b4 = jnp.arange(4, dtype=jnp.int32)[None, :]
        bd = jnp.arange(DP, dtype=jnp.int32)[None, :]
        ch = 65536

        def body(i, acc):
            t = jax.lax.dynamic_slice(tgt, (i * ch,), (ch,))
            s = jax.lax.dynamic_slice(slot, (i * ch,), (ch,))
            ib = jax.lax.dynamic_slice(id_bytes, (i * ch, 0), (ch, 4))
            ab = jax.lax.dynamic_slice(aux_bytes, (i * ch, 0), (ch, 4))
            cd = jax.lax.dynamic_slice(codes, (i * ch, 0), (ch, DP))

            def sc(a, cols, vals):
                r2 = jnp.broadcast_to(t[:, None], cols.shape)
                return a.at[r2, cols].set(vals, mode="drop")
            acc = sc(acc, s[:, None] * 4 + b4, ib)
            acc = sc(acc, RP * 4 + s[:, None] * 4 + b4, ab)
            acc = sc(acc, RP * 8 + s[:, None] * DP + bd, cd)
            return acc

        return jax.lax.fori_loop(0, E // ch, body, rows)

    rows = run_variant("window", window, rows0,
                       (tgt, slot, id_bytes, aux_bytes, codes))
    rows = run_variant("win_sort", window_sorted, rows,
                       (tgt, slot, id_bytes, aux_bytes, codes))
    rows = run_variant("aff_chunk", affine_chunked, rows,
                       (tgt, slot, id_bytes, aux_bytes, codes))
    rows = run_variant("affine", affine, rows,
                       (tgt, slot, id_bytes, aux_bytes, codes))
    print("DONE")


if __name__ == "__main__":
    main()
