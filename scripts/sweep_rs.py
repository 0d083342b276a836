"""Sweep router_starts x max_hops on the 1M bench index (real TPU).

More per-query entry points seed a better initial list (the router top-k is
one MXU matmul over the 64k sampled table, nearly free), so the walk should
converge in fewer hops; each saved hop saves expansion DMA + merge sorts +
the ~0.5 ms iteration floor.  This script measures whether (rs=8..16,
mh=6..8) beats the round-2 headline point (rs=4, mh=9).

Usage: PYTHONPATH=/root/repo python scripts/sweep_rs.py [n] [nq]
Writes one JSON line per point to stdout; progress to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)


def main():
    import numpy as np
    import jax

    cache_dir = "/tmp/diskann_tpu_jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    d, k = 128, 10

    from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
    from diskann_tpu.bench.harness import make_clustered
    from diskann_tpu.bench.recall import knn_recall

    t0 = time.time()
    x, q = make_clustered(0, n, nq, d, n_clusters=4096, sigma=0.35, device=True)
    LOG(f"data {time.time()-t0:.0f}s")

    gt_cache = f"/tmp/diskann_bench_gt_s0_c4096_sig0.35_{n}_{nq}_{d}_{k}.npy"
    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)
    else:
        t0 = time.time()
        flat = FlatIndex(x, Metric.L2)
        _, gt = flat.search(np.asarray(q), k=k)
        gt = np.asarray(gt)
        np.save(gt_cache, gt)
        LOG(f"gt {time.time()-t0:.0f}s")
        del flat

    idx_cache = f"/tmp/diskann_bench_idx_s0_c4096_sig0.35_{n}_{d}_R64"
    cfg = GraphConfig(max_degree=64, l_build=100, alpha=1.2, beam_width=4,
                      build_max_hops=12, max_occlusion_size=256)
    if os.path.isdir(idx_cache):
        t0 = time.time()
        idx = GraphIndex.load(idx_cache, search_batch_size=2048)
        LOG(f"index loaded {time.time()-t0:.0f}s")
    else:
        t0 = time.time()
        idx = GraphIndex.build(x, cfg, insert_batch_size=8192,
                               search_batch_size=2048, build_mode="packed",
                               packed_dp=64, build_backedge_src_cap=64)
        LOG(f"build {time.time()-t0:.0f}s ({n/(time.time()-t0):.0f} pts/s)")
        idx.save(idx_cache)
    x = None
    qn = np.asarray(q)
    qdt = np.float16

    # reference point first (headline config), then the starts ladder
    points = [
        {"rs": None, "mh": 9, "l": 90},
        {"rs": 8, "mh": 8, "l": 90},
        {"rs": 16, "mh": 7, "l": 90},
        {"rs": 16, "mh": 6, "l": 90},
        {"rs": 32, "mh": 6, "l": 90},
        {"rs": 16, "mh": 8, "l": 90},
    ]
    for pt in points:
        kw = dict(l_search=pt["l"], mode="packed", beam_width=4,
                  max_hops=pt["mh"], query_dtype=qdt,
                  router_starts=pt["rs"])
        try:
            idx.search(qn, k, **kw)  # compile + warm
            t0 = time.time()
            _, ids, stats = idx.search(qn, k, **kw)
            dt = time.time() - t0
        except Exception as e:
            LOG(f"point {pt} failed: {type(e).__name__}: {e}")
            continue
        r = knn_recall(ids, gt, k)
        out = {**{kk: (v if v is not None else
                       (idx.config.router_starts if kk == "rs" else v))
                  for kk, v in pt.items()},
               "recall": round(float(r), 4), "qps": round(nq / dt),
               "hops": round(float(stats.hops.mean()), 1)}
        print(json.dumps(out), flush=True)
        LOG(out)


if __name__ == "__main__":
    main()
