"""Production-path search profile at bench shape (synthetic random graph).

Times the EXACT production path (dedup='merge' packed loop + rerank +
host fetches) piece by piece, bounded iterations, plus a known-constant op
first to gauge chip contention (CLAUDE.md: identical programs vary 10-20x).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_prod.py
Env: PP_B (8192), PP_L (90), PP_W (4), PP_HOPS (24)
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

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)

N = int(os.environ.get("PP_N", 1_000_000))
B = int(os.environ.get("PP_B", 8192))
L = int(os.environ.get("PP_L", 90))
W = int(os.environ.get("PP_W", 4))
HOPS = int(os.environ.get("PP_HOPS", 24))
D, DP, RS = 128, 64, 83


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def main():
    rng = np.random.default_rng(0)
    LOG(f"[pp] backend={jax.default_backend()} N={N} B={B} L={L} W={W} "
        f"HOPS={HOPS}")

    # ---- contention reference: fixed 4096^2 matmul chained x32 ----
    a0 = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def mm(a):
        def step(i, x):
            return (x @ x * 1e-4).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, 32, step, a)

    sync(mm(a0))
    t0 = time.time()
    sync(mm(a0))
    ref_ms = (time.time() - t0) * 1e3
    LOG(f"[pp] contention ref (32x 4k matmul, ~17ms clean): {ref_ms:.1f} ms")

    # ---- RTT reference ----
    t0 = time.time()
    for _ in range(4):
        sync(a0)
    LOG(f"[pp] fetch RTT: {(time.time()-t0)/4*1e3:.1f} ms")

    # ---- build synthetic packed state ----
    proj, pscale, pbias2 = pk.train_packed(
        rng.standard_normal((4096, D)).astype(np.float32), DP, Metric.L2
    )
    key = jax.random.key(0)
    rp = pk.padded_degree(RS, DP)
    nwr = pk.n_wrows(rp, DP)
    total = (N + 1) * nwr
    n_chunks = 16
    chunk_rows = -(-total // n_chunks)
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
        rows=rows, r_pack=rp,
    )
    adjacency = jax.random.randint(
        jax.random.fold_in(key, 99), (N, RS), 0, N, dtype=jnp.int32
    )
    queries = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    start = jnp.arange(16, dtype=jnp.int32)
    sdef, sdata = packed_scorer(p, Metric.L2)
    sync(p.rows)

    # ---- production loop, both dedup modes, bounded HOPS ----
    for dd in ("merge", "list"):
        def run(q, dd=dd):
            return beam_search_scored(
                sdef, sdata, adjacency, start, q,
                l_search=L, beam_width=W, max_hops=HOPS, dedup=dd,
                expand_r=p.r_pack,
            )

        res = run(queries)
        sync(res.hops)
        t0 = time.time()
        res = run(queries)
        sync(res.hops)
        dt = time.time() - t0
        iters = float(np.asarray(res.hops).mean()) / W
        LOG(f"[pp] loop dedup={dd:5s}: {dt*1e3:7.1f} ms total, "
            f"{dt/HOPS*1e3:6.2f} ms/iter (mean iters {iters:.0f}) "
            f"=> {B/dt:.0f} QPS-loop-only")

    # ---- rerank + full-fetch overhead as in GraphIndex.search ----
    from diskann_tpu.graph.index import _rerank

    vecs = jax.random.normal(jax.random.fold_in(key, 5), (N, D), jnp.float32)
    sqn = jnp.sum(vecs * vecs, axis=-1)
    valid = jnp.ones((N,), bool)
    res = run(queries)
    sync(res.ids)
    fd, fi = _rerank(res.ids, queries, vecs, sqn, valid, Metric.L2, 10)
    sync(fd)
    t0 = time.time()
    fd, fi = _rerank(res.ids, queries, vecs, sqn, valid, Metric.L2, 10)
    a = np.asarray(fd)
    b2 = np.asarray(fi)
    c2 = np.asarray(res.cmps)
    d2 = np.asarray(res.hops)
    LOG(f"[pp] rerank + 4 output fetches: {(time.time()-t0)*1e3:.1f} ms")

    print("DONE")


if __name__ == "__main__":
    main()
