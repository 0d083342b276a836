"""Round-3 perf sweep #1: decompose the headline QPS on the CACHED bench
index.  Loads the round-2 index once, regenerates the bench queries, and
sweeps (rerank_l, router_starts, max_hops, L) on the production path.

Run:  PYTHONPATH=/root/repo python scripts/r3_sweep1.py > /tmp/r3_sweep1.json
Env:  S1_CONFIGS to override the sweep list.
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/diskann_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)


def main():
    def bail(*_):
        raise TimeoutError("step budget exceeded")

    signal.signal(signal.SIGALRM, bail)

    from diskann_tpu import GraphIndex
    from diskann_tpu.bench.harness import make_clustered
    from diskann_tpu.bench.recall import knn_recall

    n, nq, d, k = 1_000_000, 8192, 128, 10
    gt = np.load(f"/tmp/diskann_bench_gt_s0_c4096_sig0.35_{n}_{nq}_{d}_{k}.npy")
    idx_cache = f"/tmp/diskann_bench_idx_s0_c4096_sig0.35_{n}_{d}_R64"

    LOG("[s1] generating queries on device")
    signal.alarm(1200)
    x, q = make_clustered(0, n, nq, d, n_clusters=4096, sigma=0.35, device=True)
    del x
    qn = np.asarray(q)
    del q
    signal.alarm(0)

    LOG("[s1] loading cached index (8.5GB over relay; minutes)")
    t0 = time.time()
    signal.alarm(2400)
    idx = GraphIndex.load(idx_cache, search_batch_size=2048)
    signal.alarm(0)
    LOG(f"[s1] loaded in {time.time()-t0:.1f}s")

    # contention probe: known-constant op
    import jax.numpy as jnp
    a0 = jnp.ones((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a: jax.lax.fori_loop(
        0, 32, lambda i, x: (x @ x * 1e-4).astype(jnp.bfloat16), a))
    np.asarray(mm(a0)[:1, :1])
    t0 = time.time()
    np.asarray(mm(a0)[:1, :1])
    LOG(f"[s1] contention ref (clean ~17ms): {(time.time()-t0)*1e3:.1f} ms")

    # sweep: (label, L, rerank_l, max_hops, router_starts)
    cfgs = [
        ("base_L90",        90, None, 9, None),
        ("rl48",            90, 48,   9, None),
        ("rl32",            90, 32,   9, None),
        ("rl24",            90, 24,   9, None),
        ("rl16",            90, 16,   9, None),
        ("rl32_mh8",        90, 32,   8, None),
        ("rl32_rs8",        90, 32,   9, 8),
        ("rl32_rs8_mh8",    90, 32,   8, 8),
        ("rl32_rs16_mh7",   90, 32,   7, 16),
        ("rl32_L80",        80, 32,   9, None),
        ("rl32_L100_mh8",  100, 32,   8, None),
    ]
    results = []
    for label, l, rl, mh, rs in cfgs:
        try:
            signal.alarm(1500)
            idx.search(qn, k, l_search=l, mode="packed", rerank_l=rl,
                       max_hops=mh, query_dtype=np.float16,
                       router_starts=rs)  # compile
            t0 = time.time()
            _, ids, stats = idx.search(
                qn, k, l_search=l, mode="packed", rerank_l=rl, max_hops=mh,
                query_dtype=np.float16, router_starts=rs)
            dt = time.time() - t0
            signal.alarm(0)
        except TimeoutError:
            LOG(f"[s1] {label}: TIMED OUT; stopping sweep")
            break
        r = knn_recall(ids, gt, k)
        row = {"label": label, "l": l, "rerank_l": rl, "max_hops": mh,
               "router_starts": rs, "recall": round(r, 4),
               "qps": round(nq / dt), "ms": round(dt * 1e3, 1)}
        results.append(row)
        LOG(f"[s1] {json.dumps(row)}")

    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
