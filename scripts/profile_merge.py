"""Microbench: merge-path variants for the packed search loop.

Per iteration the dedup='merge' body pays two [B, L+c] multi-operand sorts
(~2.3 ms each at B=4096, c=352).  Candidates entering the best list per hop
are few, so preselecting top-K candidates with approx_min_k (TPU bin-reduce,
single pass) shrinks both sorts to [B, L+K].

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_merge.py
Env: PM_B, PM_L, PM_C, PM_K (default 4096, 140, 352, 64)
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

B = int(os.environ.get("PM_B", 4096))
L = int(os.environ.get("PM_L", 140))
C = int(os.environ.get("PM_C", 352))
K = int(os.environ.get("PM_K", 64))
ITERS = 16


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x.ravel()[:1]), out)
    t0 = time.time()
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x.ravel()[:1]), out)
    dt = (time.time() - t0) / ITERS * 1e3
    LOG(f"[pm] {name:34s} {dt:8.3f} ms/iter")
    return dt


def chain(body):
    def run(*args):
        def step(i, carry):
            return body(i, carry, *args[1:])

        return jax.lax.fori_loop(0, ITERS, step, args[0])

    return jax.jit(run)


def main():
    key = jax.random.key(0)
    LOG(f"[pm] backend={jax.default_backend()} B={B} L={L} C={C} K={K}")
    bd0 = jnp.sort(jax.random.uniform(key, (B, L), jnp.float32), axis=-1)
    bi0 = jax.random.randint(key, (B, L), 0, 1 << 20, dtype=jnp.int32)
    be0 = jnp.zeros((B, L), jnp.int32)
    cd0 = jax.random.uniform(jax.random.fold_in(key, 1), (B, C), jnp.float32)
    ci0 = jax.random.randint(
        jax.random.fold_in(key, 2), (B, C), 0, 1 << 20, dtype=jnp.int32
    )

    # ---- 1. current merge body: two [B, L+C] multi-op sorts -------------
    def cur_body(i, bd, bi, be, cd, ci):
        cd = cd + i * 1e-6
        md = jnp.concatenate([bd, cd], axis=1)
        mi = jnp.concatenate([bi, ci], axis=1)
        fl = jnp.concatenate(
            [jnp.zeros((B, L), jnp.int32), jnp.ones((B, C), jnp.int32)], axis=1
        )
        me = jnp.concatenate([be, jnp.zeros((B, C), jnp.int32)], axis=1)
        md, mi, fl, me = jax.lax.sort((md, mi, fl, me), dimension=-1, num_keys=3)
        prev = jnp.concatenate(
            [jnp.full((B, 1), -2, jnp.int32), mi[:, :-1]], axis=1
        )
        dup = (mi == prev) & (mi >= 0)
        md = jnp.where(dup, jnp.inf, md)
        mi = jnp.where(dup, -1, mi)
        me = jnp.where(dup, 1, me)
        md, mi, me = jax.lax.sort((md, mi, me), dimension=-1, num_keys=1)
        return md[:, :L]

    timeit(f"current merge 2x[B,{L + C}]", chain(cur_body), bd0, bi0, be0, cd0, ci0)

    # ---- 2. approx_min_k preselect alone --------------------------------
    def pre_body(i, cd):
        v, idx = jax.lax.approx_min_k(cd + i * 1e-6, K)
        return cd.at[:, :1].add(v[:, :1] * 0)

    timeit(f"approx_min_k [B,{C}]->{K}", chain(pre_body), cd0)

    # ---- 3. preselect + two small sorts ---------------------------------
    def pres_body(i, bd, bi, be, cd, ci):
        cd = cd + i * 1e-6
        v, idx = jax.lax.approx_min_k(cd, K)
        cik = jnp.take_along_axis(ci, idx, axis=1)
        md = jnp.concatenate([bd, v], axis=1)
        mi = jnp.concatenate([bi, cik], axis=1)
        fl = jnp.concatenate(
            [jnp.zeros((B, L), jnp.int32), jnp.ones((B, K), jnp.int32)], axis=1
        )
        me = jnp.concatenate([be, jnp.zeros((B, K), jnp.int32)], axis=1)
        md, mi, fl, me = jax.lax.sort((md, mi, fl, me), dimension=-1, num_keys=3)
        prev = jnp.concatenate(
            [jnp.full((B, 1), -2, jnp.int32), mi[:, :-1]], axis=1
        )
        dup = (mi == prev) & (mi >= 0)
        md = jnp.where(dup, jnp.inf, md)
        mi = jnp.where(dup, -1, mi)
        me = jnp.where(dup, 1, me)
        md, mi, me = jax.lax.sort((md, mi, me), dimension=-1, num_keys=1)
        return md[:, :L]

    timeit(f"preselect{K} + 2x[B,{L + K}]", chain(pres_body), bd0, bi0, be0,
           cd0, ci0)

    # ---- 4. frontier select: sort vs approx -----------------------------
    W = 4
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

    def fsort_body(i, be, bd):
        unexp = (be == 0)
        rank = jnp.cumsum(unexp.astype(jnp.int32), axis=1) - 1
        sel = unexp & (rank < W)
        sel_pos = jax.lax.sort(jnp.where(sel, pos_iota, L), dimension=-1)[:, :W]
        return be.at[:, :1].add(sel_pos[:, :1] * 0)

    timeit("frontier via [B,L] sort", chain(fsort_body), be0, bd0)

    def fapprox_body(i, be, bd):
        masked = jnp.where(be == 0, bd, jnp.inf)
        v, idx = jax.lax.approx_min_k(masked, W)
        return be.at[:, :1].add(idx[:, :1] * 0)

    timeit("frontier via approx_min_k", chain(fapprox_body), be0, bd0)

    # ---- 5. single merged approx_min_k over [B, L+C] --------------------
    def amk_body(i, bd, bi, cd, ci):
        md = jnp.concatenate([bd, cd + i * 1e-6], axis=1)
        v, idx = jax.lax.approx_min_k(md, L)
        return bd.at[:, :1].add(v[:, :1] * 0)

    timeit(f"approx_min_k [B,{L + C}]->{L}", chain(amk_body), bd0, bi0, cd0, ci0)

    # ---- 6. empty-ish body: loop fixed cost ------------------------------
    def nop_body(i, bd):
        return bd + 1.0

    timeit("loop floor (elementwise)", chain(nop_body), bd0)

    print("DONE")


if __name__ == "__main__":
    main()
