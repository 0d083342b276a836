"""Round-3 perf sweep #3: dp=128 packed re-attach (full-dim int8 codes,
read-only) + rerank-budget/L sweep.  Fixes sweep2's OOM: no references to
the old packed table may survive the re-attach.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_sweep3.py \
        > /tmp/r3_sweep3.json 2> /tmp/r3_sweep3.log
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

    LOG("[s3] generating queries on device")
    signal.alarm(1200)
    x, q = make_clustered(0, n, nq, d, n_clusters=4096, sigma=0.35, device=True)
    del x
    qn = np.asarray(q)
    del q
    signal.alarm(0)

    LOG("[s3] loading cached index")
    t0 = time.time()
    signal.alarm(2400)
    idx = GraphIndex.load(idx_cache, search_batch_size=2048)
    signal.alarm(0)
    LOG(f"[s3] loaded in {time.time()-t0:.1f}s")

    a0 = jnp.ones((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a: jax.lax.fori_loop(
        0, 32, lambda i, x: (x @ x * 1e-4).astype(jnp.bfloat16), a))
    np.asarray(mm(a0)[:1, :1])
    t0 = time.time()
    np.asarray(mm(a0)[:1, :1])
    LOG(f"[s3] contention ref (clean ~17ms): {(time.time()-t0)*1e3:.1f} ms")

    def point(label, **kw):
        try:
            signal.alarm(1800)
            idx.search(qn, k, mode="packed", query_dtype=np.float16, **kw)
            t0 = time.time()
            _, ids, stats = idx.search(
                qn, k, mode="packed", query_dtype=np.float16, **kw)
            dt = time.time() - t0
            signal.alarm(0)
        except Exception as e:
            signal.alarm(0)
            LOG(f"[s3] {label}: {type(e).__name__}: {e}")
            return None
        r = knn_recall(ids, gt, k)
        row = {"label": label, **{kk: v for kk, v in kw.items()},
               "recall": round(r, 4), "qps": round(nq / dt),
               "ms": round(dt * 1e3, 1),
               "hops": round(float(stats.hops.mean()), 1)}
        OUT.append(row)
        LOG(f"[s3] {json.dumps(row)}")
        return row

    LOG("[s3] re-attaching packed layout at dp=128 (read-only)")
    t0 = time.time()
    signal.alarm(2400)
    idx.attach_packed(dp=128, writable=False)
    signal.alarm(0)
    LOG(f"[s3] attach dp=128 in {time.time()-t0:.1f}s")

    point("dp128_L90_rl90", l_search=90, max_hops=9)
    point("dp128_L90_rl32", l_search=90, rerank_l=32, max_hops=9)
    point("dp128_L90_rl16", l_search=90, rerank_l=16, max_hops=9)
    point("dp128_L70_rl24", l_search=70, rerank_l=24, max_hops=9)
    point("dp128_L60_rl20", l_search=60, rerank_l=20, max_hops=8)
    point("dp128_L50_rl20", l_search=50, rerank_l=20, max_hops=8)
    point("dp128_L80_rl24_mh8", l_search=80, rerank_l=24, max_hops=8)

    print(json.dumps(OUT, indent=1), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        LOG(f"[s3] FAILED: {type(e).__name__}: {e}")
        print(json.dumps(OUT, indent=1), flush=True)
        raise
