"""Per-iteration breakdown of the packed search loop at bench shape.

Synthetic 1M random graph + packed state (no build needed).  Measures:
  1. full beam_search_scored loop ms/iter (expand kernel per env);
  2. expand-only chained (the fused kernel or XLA fallback);
  3. the [B, C, L] best-list membership compare alone;
  4. the [B, L+C] 3-operand merge sort alone;
  5. candidate sort [B, C] alone.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_hop4.py
     DISKANN_NO_FATKERNEL=1 ... (XLA expand fallback)
Env: PH_B, PH_L, PH_W (default 4096, 140, 4)
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

from diskann_tpu.graph import packed as pk  # noqa: E402
from diskann_tpu.graph.scorers import packed_scorer  # noqa: E402
from diskann_tpu.graph.search import beam_search_scored  # noqa: E402
from diskann_tpu.ops.distance import Metric  # noqa: E402
from diskann_tpu.ops.topk import mask_duplicates_sorted  # noqa: E402

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)

N = int(os.environ.get("PH_N", 1_000_000))
B = int(os.environ.get("PH_B", 4096))
L = int(os.environ.get("PH_L", 140))
W = int(os.environ.get("PH_W", 4))
D, DP, RS = 128, 64, 83
ITERS = 16


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x.ravel()[:1]), out)
    t0 = time.time()
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x.ravel()[:1]), out)
    dt = (time.time() - t0) / ITERS * 1e3
    LOG(f"[ph] {name:28s} {dt:8.3f} ms/iter")
    return dt


def chain(body):
    """fori_loop-chained timing inside ONE jit (per CLAUDE.md).  All array
    operands must be passed as args (closure capture would serialize them
    into the remote compile request)."""

    def run(*args):
        def step(i, carry):
            return body(i, carry, *args[1:])

        return jax.lax.fori_loop(0, ITERS, step, args[0])

    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    LOG(f"[ph] backend={jax.default_backend()} N={N} B={B} L={L} W={W} "
        f"kernel={'off' if os.environ.get('DISKANN_NO_FATKERNEL')=='1' else 'on'}")
    proj, pscale, pbias2 = pk.train_packed(
        rng.standard_normal((4096, D)).astype(np.float32), DP, Metric.L2
    )
    key = jax.random.key(0)
    nwr = pk.n_wrows(pk.padded_degree(RS, DP), DP)
    total = (N + 1) * nwr
    n_chunks = 16
    chunk_rows = -(-total // n_chunks)
    # random bytes everywhere (ids decode to arbitrary ints; search clamps) —
    # for timing that is fine and adversarially cache-unfriendly.  Fill a
    # donated buffer chunkwise: one-shot randint needs a 4x u32 temp and a
    # concat doubles the 6.15GB table.
    rows = jnp.zeros((chunk_rows * n_chunks, 128), jnp.int32)
    upd = jax.jit(
        lambda r, c, i: jax.lax.dynamic_update_slice(
            r, c, (i * chunk_rows, jnp.int32(0))
        ),
        donate_argnums=(0,),
    )
    gen = jax.jit(lambda k: jax.random.randint(
        k, (chunk_rows, 128), -(2**31), 2**31 - 1, dtype=jnp.int32))
    for i in range(n_chunks):
        rows = upd(rows, gen(jax.random.fold_in(key, i)), jnp.int32(i))
    rows = rows[:total]
    p = pk.PackedState(
        proj=proj, pscale=pscale, pbias2=pbias2,
        self_codes=jax.random.randint(key, (N, DP), -127, 128, dtype=jnp.int8),
        self_aux=jax.random.uniform(key, (N,), jnp.float32, 0.0, 50.0),
        rows=rows,
        r_pack=pk.padded_degree(RS, DP),
    )
    adjacency = jax.random.randint(
        jax.random.fold_in(key, 99), (N, RS), 0, N, dtype=jnp.int32
    )
    queries = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    start = jnp.arange(16, dtype=jnp.int32)

    sdef, sdata = packed_scorer(p, Metric.L2)
    np.asarray(p.rows[:1, :1])

    # ---- 1. full loop (beam_search_scored is itself jitted; big arrays
    # must be ARGUMENTS — closure capture serializes them into the remote
    # compile request) ----
    def full_j(queries):
        return beam_search_scored(
            sdef, sdata, adjacency, start, queries,
            l_search=L, beam_width=W, max_hops=ITERS,
            dedup="list", expand_r=p.r_pack,
        )

    res = full_j(queries)
    np.asarray(res.hops[:1])
    t0 = time.time()
    res = full_j(queries)
    hops = np.asarray(res.hops)
    dt = (time.time() - t0) / ITERS * 1e3
    LOG(f"[ph] {'full loop':28s} {dt:8.3f} ms/iter "
        f"(mean hops {hops.mean():.0f} => {hops.mean()/W:.0f} iters)")

    # ---- 2. expand-only chained ---------------------------------------
    q_ctx = sdef.prep(sdata, queries)
    beam0 = jax.random.randint(key, (B, W), 0, N, dtype=jnp.int32)
    bval = jnp.ones((B, W), dtype=bool)

    def exp_body(i, bm, sdata, q_ctx, bval):
        cand, cd = sdef.expand(sdata, q_ctx, bm, bval)
        nxt = jnp.abs(cand[:, :W] + i) % N
        return nxt.astype(jnp.int32)

    timeit("expand only", chain(exp_body), beam0, sdata, q_ctx, bval)

    # ---- 3. membership compare alone ----------------------------------
    c = W * p.r_pack
    cand0 = jax.random.randint(key, (B, c), 0, N, dtype=jnp.int32)
    best_i = jax.random.randint(key, (B, L), 0, N, dtype=jnp.int32)

    def mem_body(i, cd, best_i):
        in_list = jnp.any(cd[:, :, None] == best_i[:, None, :], axis=-1)
        return cd + in_list.astype(jnp.int32)

    timeit(f"in_list [B,{c},{L}]", chain(mem_body), cand0, best_i)

    # ---- 4. merge sort alone ------------------------------------------
    bd0 = jax.random.uniform(key, (B, L), jnp.float32)
    cd0 = jax.random.uniform(key, (B, c), jnp.float32)
    be0 = jnp.zeros((B, L), jnp.int32)

    def merge_body(i, bd0, cd0, be0, best_i, cand0):
        md = jnp.concatenate([bd0 + i, cd0], axis=1)
        mi = jnp.concatenate([best_i, cand0], axis=1)
        me = jnp.concatenate([be0, jnp.ones((B, c), jnp.int32)], axis=1)
        md, mi, me = jax.lax.sort((md, mi, me), dimension=-1, num_keys=1)
        return md[:, :L]

    timeit(f"merge sort [B,{L + c}]x3", chain(merge_body), bd0, cd0, be0,
           best_i, cand0)

    # ---- 5. candidate sort alone --------------------------------------
    def csort_body(i, cd, cd0):
        a, b2 = jax.lax.sort((cd + i, cd0), dimension=-1, num_keys=1)
        return a

    timeit(f"cand sort [B,{c}]x2", chain(csort_body), cand0, cd0)

    # ---- 6. dup-mask alone --------------------------------------------
    def dup_body(i, cd):
        dup = mask_duplicates_sorted(cd + i)
        return cd + dup.astype(jnp.int32)

    timeit(f"dup mask [B,{c}]", chain(dup_body), cand0)

    print("DONE")


if __name__ == "__main__":
    main()
