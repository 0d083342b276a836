"""Round-3 hop ablation: unified fat-row layout (ids|aux|codes in ONE row).

Round 2 showed the expand is row-ISSUE-bound (~70ns/row-issue; dp=32 no
faster than dp=64).  The current packed layout issues THREE gathers per
beam node (adjacency row, aux row, codes row).  This measures ONE gather
of a fat row [r_pack i32 ids | r_pack f32 aux | r_pack*dp i8 codes],
decoded with slices + bitcasts.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_hop3.py
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

N = int(os.environ.get("PH_N", 1_000_000))
ITERS = int(os.environ.get("PH_ITERS", 24))
B, W, RP, DP = 4096, 4, 84, 64
IDS_OFF = 0
AUX_OFF = RP * 4
CODE_OFF = RP * 8
ROW = -(-(RP * (8 + DP)) // 128) * 128   # pad to 128B tiles


def make_fat_rows(key):
    gen = jax.jit(
        lambda k: jax.random.randint(k, (N // 8, ROW), -127, 128, dtype=jnp.int8)
    )
    return jnp.concatenate(
        [gen(jax.random.fold_in(key, i)) for i in range(8)], axis=0
    )


def build_loop(stage):
    c = W * RP

    def hop(carry, data):
        acc, beam = carry
        rows_t, qi, qscale, qsq = data
        safe = jnp.clip(beam, 0, N - 1)
        fat = rows_t[safe]                            # [B, W, ROW] one gather
        idb = fat[:, :, IDS_OFF:AUX_OFF].reshape(B, W, RP, 4)
        cand = jax.lax.bitcast_convert_type(idb, jnp.int32).reshape(B, c)
        # random bytes -> random ids; clamp into range to keep loop stable
        cand = jnp.abs(cand) % N
        if stage == "gather_ids":
            s = cand.sum(axis=1)
            nxt = (beam + 1) % N
            return (acc + s.astype(jnp.float32)[:, None] * 1e-30, nxt), None
        auxb = fat[:, :, AUX_OFF:CODE_OFF].reshape(B, W, RP, 4)
        aux = jnp.abs(
            jax.lax.bitcast_convert_type(auxb, jnp.int32).reshape(B, c)
        ).astype(jnp.float32) * 1e-6
        codes = fat[:, :, CODE_OFF:CODE_OFF + RP * DP].reshape(B, c, DP)
        dots_i = jax.lax.dot_general(
            qi, codes, (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        dots = dots_i.astype(jnp.float32) * qscale[:, None]
        cd = jnp.maximum(qsq[:, None] + aux - 2.0 * dots, 0.0)
        s = cd.min(axis=1)
        nxt = (beam + 1) % N
        return (acc + s[:, None] * 1e-30, nxt), None

    def run(rows_t, qi, qscale, qsq, beam0):
        acc = jnp.zeros((B, 1), jnp.float32)
        data = (rows_t, qi, qscale, qsq)
        carry, _ = jax.lax.scan(
            lambda cr, _: hop(cr, data), (acc, beam0), None, length=ITERS
        )
        return carry[0]

    return jax.jit(run)


def main():
    LOG(f"[p3] backend={jax.default_backend()} N={N} ROW={ROW} iters={ITERS}")
    key = jax.random.key(7)
    rows_t = make_fat_rows(key)
    qi = jax.random.randint(key, (B, DP), -127, 128, dtype=jnp.int8)
    qscale = jnp.full((B,), 1e-3, jnp.float32)
    qsq = jax.random.uniform(key, (B,), jnp.float32, 0.0, 100.0)
    beam0 = jax.random.randint(key, (B, W), 0, N, dtype=jnp.int32)
    np.asarray(rows_t[:1, :1])

    for stage in ("gather_ids", "full"):
        fn = build_loop(stage)
        t0 = time.time()
        out = fn(rows_t, qi, qscale, qsq, beam0)
        np.asarray(out[:1, :1])
        first = time.time() - t0
        t0 = time.time()
        out = fn(rows_t, qi, qscale, qsq, beam0)
        np.asarray(out[:1, :1])
        dt = time.time() - t0
        LOG(f"[p3] fatrow_{stage:10s} {dt/ITERS*1e3:8.3f} ms/hop "
            f"(first {first:.0f}s)")
    print("DONE")


if __name__ == "__main__":
    main()
