"""Round-3 perf sweep #4: dp=128 low-L frontier — find the QPS-max config
with recall@10 >= 0.95 margin.  Each point repeats 3x and reports all
timings (the shared chip varies 3-10x; the MAX qps of 3 runs approximates
the clean-chip number, recall is deterministic).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_sweep4.py \
        > /tmp/r3_sweep4.json 2> /tmp/r3_sweep4.log
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)
OUT = []


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

    LOG("[s4] generating queries on device")
    signal.alarm(1200)
    x, q = make_clustered(0, n, nq, d, n_clusters=4096, sigma=0.35, device=True)
    del x
    qn = np.asarray(q)
    del q
    signal.alarm(0)

    LOG("[s4] loading cached index")
    signal.alarm(2400)
    idx = GraphIndex.load(idx_cache, search_batch_size=2048)
    signal.alarm(0)

    a0 = jnp.ones((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a: jax.lax.fori_loop(
        0, 32, lambda i, x: (x @ x * 1e-4).astype(jnp.bfloat16), a))
    np.asarray(mm(a0)[:1, :1])

    LOG("[s4] attaching dp=128 read-only")
    signal.alarm(2400)
    idx.attach_packed(dp=128, writable=False)
    signal.alarm(0)

    def contention():
        t0 = time.time()
        np.asarray(mm(a0)[:1, :1])
        return round((time.time() - t0) * 1e3)

    def point(label, reps=3, **kw):
        try:
            signal.alarm(1800)
            idx.search(qn, k, mode="packed", query_dtype=np.float16, **kw)
            times = []
            for _ in range(reps):
                t0 = time.time()
                _, ids, stats = idx.search(
                    qn, k, mode="packed", query_dtype=np.float16, **kw)
                times.append(time.time() - t0)
            signal.alarm(0)
        except Exception as e:
            signal.alarm(0)
            LOG(f"[s4] {label}: {type(e).__name__}: {e}")
            return None
        r = knn_recall(ids, gt, k)
        row = {"label": label, **{kk: v for kk, v in kw.items()},
               "recall": round(r, 4),
               "qps_best": round(nq / min(times)),
               "qps_all": [round(nq / t) for t in times],
               "contention_ms": contention(),
               "hops": round(float(stats.hops.mean()), 1)}
        OUT.append(row)
        LOG(f"[s4] {json.dumps(row)}")
        return row

    point("L60_rl20_mh8", l_search=60, rerank_l=20, max_hops=8)
    point("L40_rl16_mh8", l_search=40, rerank_l=16, max_hops=8)
    point("L40_rl16_mh7", l_search=40, rerank_l=16, max_hops=7)
    point("L30_rl12_mh7", l_search=30, rerank_l=12, max_hops=7)
    point("L30_rl12_mh6", l_search=30, rerank_l=12, max_hops=6)
    point("L24_rl12_mh6", l_search=24, rerank_l=12, max_hops=6)
    point("L20_rl10_mh6", l_search=20, rerank_l=10, max_hops=6)
    point("L40_w2_mh14", l_search=40, rerank_l=16, max_hops=14,
          beam_width=2)
    point("L30_w2_mh12", l_search=30, rerank_l=12, max_hops=12,
          beam_width=2)

    print(json.dumps(OUT, indent=1), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        LOG(f"[s4] FAILED: {type(e).__name__}: {e}")
        print(json.dumps(OUT, indent=1), flush=True)
        raise
