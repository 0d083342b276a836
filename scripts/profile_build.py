"""Per-phase timing of insert_batch at bench shape (1M cap, M=8192 batch).

Measures standalone, on synthetic state (no real build):
  1. refresh_rows: T=2*8192 packed fat-row rebuilds (phases 3a+3c)
  2. append_edges XLA fallback: E=8192*64 backedge splices (phase 3b)
  3. chunked_robust_prune: M=8192 pools of C=750 (phase 2 prune)
  4. intra-batch pairwise + approx_min_k (phase 2 candidates)
  5. adjacency flat scatter (phase 3b adjacency commit)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_build.py
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
from diskann_tpu.graph.build import chunked_robust_prune  # noqa: E402
from diskann_tpu.graph.config import GraphConfig  # noqa: E402
from diskann_tpu.ops.distance import Metric, pairwise_distance  # noqa: E402

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)

N = int(os.environ.get("PB_N", 1_000_000))
M = int(os.environ.get("PB_M", 8192))
D, DP, RS, R = 128, 64, 83, 64
E = M * R
ITERS = 4


def sync(x):
    np.asarray(x.ravel()[:1])


def main():
    rng = np.random.default_rng(0)
    LOG(f"[pb] backend={jax.default_backend()} N={N} M={M} E={E}")
    key = jax.random.key(0)
    proj, pscale, pbias2 = pk.train_packed(
        rng.standard_normal((4096, D)).astype(np.float32), DP, Metric.L2
    )
    p = pk.alloc_packed(proj, pscale, pbias2, N, RS)
    p = p._replace(
        self_codes=jax.random.randint(key, (N, DP), -127, 128, dtype=jnp.int8),
        self_aux=jax.random.uniform(key, (N,), jnp.float32, 0.0, 50.0),
    )
    adjacency = jax.random.randint(
        jax.random.fold_in(key, 1), (N, RS), -1, N, dtype=jnp.int32
    )
    sync(p.rows)

    # ---- 1. refresh_rows (T = 2*M rows, as in phases 3a + 3c) ----------
    t_rows = jax.random.randint(
        jax.random.fold_in(key, 2), (2 * M,), 0, N, dtype=jnp.int32
    )

    t0 = time.time()
    p2 = pk.refresh_rows_donated(p, adjacency, t_rows)
    sync(p2.rows)
    first = time.time() - t0
    t0 = time.time()
    for i in range(ITERS):
        p2 = pk.refresh_rows_donated(p2, adjacency, t_rows)
    sync(p2.rows)
    LOG(f"[pb] refresh_rows T={2*M}:      "
        f"{(time.time()-t0)/ITERS*1e3:8.1f} ms (first {first:.0f}s)")
    p = p2

    # ---- 2. append_edges XLA fallback ---------------------------------
    os.environ["DISKANN_APPEND_KERNEL"] = "0"
    tgt = jnp.sort(jax.random.randint(
        jax.random.fold_in(key, 3), (E,), 0, N, dtype=jnp.int32
    ))
    slot = jax.random.randint(
        jax.random.fold_in(key, 4), (E,), 0, RS, dtype=jnp.int32
    )
    src = jax.random.randint(
        jax.random.fold_in(key, 5), (E,), 0, N, dtype=jnp.int32
    )
    ok = jnp.ones((E,), bool)

    t0 = time.time()
    p2 = pk.append_edges_deferred(p, tgt, slot, src, ok)
    sync(p2.rows)
    first = time.time() - t0
    t0 = time.time()
    for i in range(ITERS):
        p2 = pk.append_edges_deferred(p2, tgt, slot, src, ok)
    sync(p2.rows)
    LOG(f"[pb] append_deferred E={E}:  "
        f"{(time.time()-t0)/ITERS*1e3:8.1f} ms (first {first:.0f}s)")
    p = p2

    # ---- 3. chunked_robust_prune M pools of C=750 ---------------------
    vectors = jax.random.normal(jax.random.fold_in(key, 6), (N, D), jnp.float32)
    cfg = GraphConfig(max_degree=R, l_build=100)
    pv = jax.random.normal(jax.random.fold_in(key, 7), (M, D), jnp.float32)
    ci = jax.random.randint(
        jax.random.fold_in(key, 8), (M, 750), 0, N, dtype=jnp.int32
    )
    si = jnp.arange(M, dtype=jnp.int32)

    pr = jax.jit(
        lambda v, pv, ci, si: chunked_robust_prune(
            v, pv, ci, None, si, cfg, degree=R
        )
    )
    t0 = time.time()
    out = pr(vectors, pv, ci, si)
    sync(out[0])
    first = time.time() - t0
    t0 = time.time()
    out = pr(vectors, pv, ci, si)
    sync(out[0])
    LOG(f"[pb] robust_prune M={M} C=750: "
        f"{(time.time()-t0)*1e3:8.1f} ms (first {first:.0f}s)")

    # ---- 4. intra-batch candidates ------------------------------------
    def intra(pv):
        ib = pairwise_distance(pv, pv, Metric.L2)
        d, pos = jax.lax.approx_min_k(ib, 750)
        return d

    it = jax.jit(intra)
    t0 = time.time()
    sync(it(pv))
    first = time.time() - t0
    t0 = time.time()
    sync(it(pv))
    LOG(f"[pb] intra-batch M={M}:        "
        f"{(time.time()-t0)*1e3:8.1f} ms (first {first:.0f}s)")

    # ---- 5. adjacency flat scatter ------------------------------------
    def adj_scatter(adj, tgt, slot, src):
        flat_idx = tgt * RS + slot
        af = adj.reshape(-1).at[flat_idx].set(src, mode="drop")
        return af.reshape(N, RS)

    asj = jax.jit(adj_scatter, donate_argnums=(0,))
    t0 = time.time()
    a2 = asj(adjacency, tgt, slot, src)
    sync(a2)
    first = time.time() - t0
    t0 = time.time()
    for i in range(ITERS):
        a2 = asj(a2, tgt, slot, src)
    sync(a2)
    LOG(f"[pb] adj scatter E={E}:   "
        f"{(time.time()-t0)/ITERS*1e3:8.1f} ms (first {first:.0f}s)")

    print("DONE")


if __name__ == "__main__":
    main()
