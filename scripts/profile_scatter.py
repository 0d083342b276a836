"""Scatter formulation shootout for the backedge append.

The adjacency commit (flat scalar i32 scatter, 524k indices) runs ~33ns/idx
while append_edges' 2-D column-indexed byte scatters take ~2.5us/idx.  Which
formulations are fast?

  1. i32 flat scalar scatter, E indices            (known-fast control)
  2. i32 flat scatter, [E,16] affine iota -> flat  (codes as 16 words/edge)
  3. i8 1-D table, [E,64] affine iota -> flat      (codes as bytes)
  4. i8 1-D table, E scalar bytes                  (ids one byte)
  5. i32 2-D [R,32] table, (row, col) scalar form  (segmented dims)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_scatter.py
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

E = int(os.environ.get("PS_E", 524_288))
NW = 48_000_048 * 32      # i32 words in the 1M-cap sector table
ITERS = 4


def bench(name, fn, *args):
    f = jax.jit(fn, donate_argnums=(0,))
    t0 = time.time()
    out = f(*args)
    np.asarray(out.ravel()[:1])
    first = time.time() - t0
    t0 = time.time()
    for _ in range(ITERS):
        out = f(out, *args[1:])
    np.asarray(out.ravel()[:1])
    LOG(f"[sc] {name:36s} {(time.time()-t0)/ITERS*1e3:9.1f} ms "
        f"(first {first:.0f}s)")
    return out


def main():
    LOG(f"[sc] backend={jax.default_backend()} E={E} words={NW}")
    key = jax.random.key(0)
    tbl32 = jnp.zeros((NW,), jnp.int32)
    idx = jax.random.randint(key, (E,), 0, NW - 64, dtype=jnp.int32)
    val = jax.random.randint(key, (E,), -2**31, 2**31 - 1, dtype=jnp.int32)

    # 1. flat scalar i32
    tbl32 = bench("i32 flat scalar [E]",
                  lambda t, i, v: t.at[i].set(v, mode="drop"),
                  tbl32, idx, val)

    # 2. i32 flat, 16 words per edge (affine)
    v16 = jax.random.randint(key, (E, 16), -2**31, 2**31 - 1, dtype=jnp.int32)
    k16 = jnp.arange(16, dtype=jnp.int32)[None, :]

    def f2(t, i, v):
        ii = (i[:, None] & ~15) + k16
        return t.at[ii.reshape(-1)].set(v.reshape(-1), mode="drop")

    tbl32 = bench("i32 flat [E,16] affine", f2, tbl32, idx, v16)
    del tbl32

    tbl8 = jnp.zeros((NW * 4,), jnp.int8)
    v64 = jax.random.randint(key, (E, 64), -127, 128, dtype=jnp.int8)
    k64 = jnp.arange(64, dtype=jnp.int32)[None, :]
    idx8 = idx * 4

    # 3. i8 1-D, 64 bytes per edge (affine)
    def f3(t, i, v):
        ii = (i[:, None] & ~63) + k64
        return t.at[ii.reshape(-1)].set(v.reshape(-1), mode="drop")

    try:
        tbl8 = bench("i8 1-D [E,64] affine", f3, tbl8, idx8, v64)
    except Exception as e:
        LOG(f"[sc] i8 1-D [E,64] affine FAILED: {type(e).__name__}")

    # 4. i8 1-D scalar
    vb = jax.random.randint(key, (E,), -127, 128, dtype=jnp.int8)
    tbl8 = bench("i8 1-D scalar [E]", lambda t, i, v: t.at[i].set(v, mode="drop"),
                 tbl8, idx8, vb)
    del tbl8

    # 5. i32 2-D [R, 32] (row, col) scalar
    r = NW // 32
    tbl2 = jnp.zeros((r, 32), jnp.int32)
    rows = idx // 32
    cols = idx % 32
    tbl2 = bench(
        "i32 2-D [R,32] (row,col) scalar",
        lambda t, r_, c_, v: t.at[r_, c_].set(v, mode="drop"),
        tbl2, rows, cols, val,
    )
    del tbl2
    print("DONE")


if __name__ == "__main__":
    main()
