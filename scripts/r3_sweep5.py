"""Round-3 perf sweep #5: sub-batch size x (L, mh, W) fine-tune around the
sweep-4 winners (dp=128, L~24-40).  3 reps per point, report best.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_sweep5.py \
        > /tmp/r3_sweep5.json 2> /tmp/r3_sweep5.log
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

    signal.alarm(1200)
    x, q = make_clustered(0, n, nq, d, n_clusters=4096, sigma=0.35, device=True)
    del x
    qn = np.asarray(q)
    del q
    signal.alarm(0)

    LOG("[s5] loading cached index")
    signal.alarm(2400)
    idx = GraphIndex.load(idx_cache, search_batch_size=2048)
    signal.alarm(0)
    a0 = jnp.ones((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a: jax.lax.fori_loop(
        0, 32, lambda i, x: (x @ x * 1e-4).astype(jnp.bfloat16), a))
    np.asarray(mm(a0)[:1, :1])
    LOG("[s5] attaching dp=128 read-only")
    signal.alarm(2400)
    idx.attach_packed(dp=128, writable=False)
    signal.alarm(0)

    def contention():
        t0 = time.time()
        np.asarray(mm(a0)[:1, :1])
        return round((time.time() - t0) * 1e3)

    def point(label, sbs=2048, reps=3, **kw):
        idx.search_batch_size = sbs
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
            LOG(f"[s5] {label}: {type(e).__name__}: {e}")
            return None
        r = knn_recall(ids, gt, k)
        row = {"label": label, "sbs": sbs, **{kk: v for kk, v in kw.items()},
               "recall": round(r, 4),
               "qps_best": round(nq / min(times)),
               "qps_all": [round(nq / t) for t in times],
               "contention_ms": contention()}
        OUT.append(row)
        LOG(f"[s5] {json.dumps(row)}")
        return row

    point("L24_mh6_sbs2k", sbs=2048, l_search=24, rerank_l=12, max_hops=6)
    point("L24_mh6_sbs4k", sbs=4096, l_search=24, rerank_l=12, max_hops=6)
    point("L24_mh6_sbs8k", sbs=8192, l_search=24, rerank_l=12, max_hops=6)
    point("L24_mh7_sbs4k", sbs=4096, l_search=24, rerank_l=12, max_hops=7)
    point("L28_mh6_sbs4k", sbs=4096, l_search=28, rerank_l=12, max_hops=6)
    point("L30w2_mh12_sbs4k", sbs=4096, l_search=30, rerank_l=12,
          max_hops=12, beam_width=2)
    point("L24w2_mh10_sbs4k", sbs=4096, l_search=24, rerank_l=12,
          max_hops=10, beam_width=2)
    point("L24_mh6_rs8_sbs4k", sbs=4096, l_search=24, rerank_l=12,
          max_hops=6, router_starts=8)

    print(json.dumps(OUT, indent=1), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        LOG(f"[s5] FAILED: {type(e).__name__}: {e}")
        print(json.dumps(OUT, indent=1), flush=True)
        raise
