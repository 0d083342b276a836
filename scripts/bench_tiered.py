"""Tiered-index bench: QPS/recall vs io_limit + staging throughput.

Measures the DiskANN-disk analogue end to end on real hardware: packed int8
traversal in HBM, full vectors in a host-side fbin (native mmap gather),
software-pipelined staging + rerank (`tiered/index.py:search_batched`).

Produces JSON lines:
  {"io_limit": L, "recall": r, "qps": q, "rows_staged_per_s": s}

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_tiered.py
Env: BT_N (500_000), BT_NQ (4096), BT_D (128), BT_L (100)
"""

import json
import os
import sys
import time

import numpy as np

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", "/tmp/diskann_tpu_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from diskann_tpu import FlatIndex, GraphConfig, Metric
    from diskann_tpu.bench.harness import make_clustered
    from diskann_tpu.bench.recall import knn_recall
    from diskann_tpu.io_.fbin import write_fbin
    from diskann_tpu.tiered import HostVectorStore, TieredIndex
    from diskann_tpu.graph.index import GraphIndex

    n = int(os.environ.get("BT_N", 500_000))
    nq = int(os.environ.get("BT_NQ", 4096))
    d = int(os.environ.get("BT_D", 128))
    l = int(os.environ.get("BT_L", 100))
    k = 10

    LOG(f"[bt] data n={n} d={d}")
    x, q = make_clustered(0, n, nq, d, n_clusters=2048, sigma=0.35,
                          device=True)
    gt_cache = f"/tmp/diskann_bt_gt_{n}_{nq}_{d}.npy"
    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)
    else:
        LOG("[bt] groundtruth")
        _, gt = FlatIndex(x, Metric.L2).search(np.asarray(q), k=k)
        gt = np.asarray(gt)
        np.save(gt_cache, gt)
    xh = np.asarray(x)
    q = np.asarray(q)
    fbin = f"/tmp/diskann_bt_vecs_{n}_{d}.fbin"
    if not os.path.exists(fbin):
        write_fbin(fbin, xh)

    LOG("[bt] build")
    t0 = time.time()
    graph = GraphIndex.build(
        xh, GraphConfig(max_degree=64, l_build=100, beam_width=4),
        insert_batch_size=8192, build_mode="packed", packed_dp=64,
    )
    LOG(f"[bt] built in {time.time()-t0:.0f}s")
    graph._cached_start = graph._start()
    import jax.numpy as jnp

    graph.state = graph.state._replace(
        vectors=jnp.zeros((1, d), graph.state.vectors.dtype),
        sq_norms=jnp.zeros((1,), jnp.float32),
    )
    graph._hbm_vectors_dropped = True
    store = HostVectorStore.from_fbin(fbin, cache_rows=1 << 16)
    t = TieredIndex(graph, store)

    for io_limit in (16, 24, 32, 48, 64, 100):
        t.io_limit = io_limit
        t.io_stats = {"rows_staged": 0, "stage_s": 0.0}
        t.search_batched(q, k=k, l_search=l, batch_size=4096)  # warm/compile
        t.io_stats = {"rows_staged": 0, "stage_s": 0.0}
        t0 = time.time()
        od, oi, _ = t.search_batched(q, k=k, l_search=l, batch_size=4096)
        dt = time.time() - t0
        r = knn_recall(oi, gt, k)
        staged = t.io_stats["rows_staged"]
        stage_s = max(t.io_stats["stage_s"], 1e-9)
        print(json.dumps({
            "io_limit": io_limit,
            "recall": round(float(r), 4),
            "qps": round(nq / dt, 1),
            "rows_staged": int(staged),
            "rows_staged_per_s_submit": round(staged / stage_s, 1),
            "wall_s": round(dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
