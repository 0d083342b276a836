"""Controlled production QPS sweep on the REAL bench index (1M x 128).

Builds (or loads) the exact bench.py index ONCE, then sweeps search
configs (L, W, max_hops, rerank_l) in one process with a
contention probe before each timed point — the v5e chip is shared and
identical programs vary 10-20x across runs, so only same-process deltas
with a healthy probe are trustworthy (CLAUDE.md perf model).

Run: PYTHONPATH=/root/repo python scripts/profile_qps.py
Env: QPS_N (1M), QPS_NQ (8192), QPS_CONFIGS (json list override)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/diskann_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)

N = int(os.environ.get("QPS_N", 1_000_000))
NQ = int(os.environ.get("QPS_NQ", 8192))
D, K = 128, 10

# (l, w, max_hops, rerank_l)
CONFIGS = [
    (90, 4, None, None, False),   # current bench baseline
    (90, 4, None, 32, False),     # rerank budget
    (90, 4, 18, 32, False),       # + hop cap
    (100, 4, 16, 32, False),
    (100, 4, 14, 32, False),
    (120, 4, 14, 32, False),
    (100, 8, 8, 32, False),       # wide beam, capped
    (90, 4, None, 16, False),
    (60, 4, None, 32, False),
]
if os.environ.get("QPS_CONFIGS"):
    CONFIGS = [tuple(c) for c in json.loads(os.environ["QPS_CONFIGS"])]


def probe():
    a0 = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def mm(a):
        return jax.lax.fori_loop(
            0, 32, lambda i, x: (x @ x * 1e-4).astype(jnp.bfloat16), a
        )

    np.asarray(mm(a0).ravel()[:1])
    t0 = time.time()
    np.asarray(mm(a0).ravel()[:1])
    return (time.time() - t0) * 1e3  # ~17ms clean + ~30ms RTT


def main():
    from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
    from diskann_tpu.bench.harness import make_clustered
    from diskann_tpu.bench.recall import knn_recall

    LOG(f"[qps] generating data n={N} nq={NQ}")
    x, q = make_clustered(0, N, NQ, D, n_clusters=4096, sigma=0.35, device=True)
    gt_cache = f"/tmp/diskann_bench_gt_s0_c4096_sig0.35_{N}_{NQ}_{D}_{K}.npy"
    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)
        LOG(f"[qps] groundtruth from {gt_cache}")
    else:
        t0 = time.time()
        flat = FlatIndex(x, Metric.L2)
        _, gt = flat.search(np.asarray(q), k=K)
        gt = np.asarray(gt)
        np.save(gt_cache, gt)
        del flat
        LOG(f"[qps] groundtruth in {time.time()-t0:.0f}s")

    dp = int(os.environ.get("QPS_DP", 64))
    r_deg = int(os.environ.get("QPS_R", 64))
    rsz = int(os.environ.get("QPS_ROUTER", 32768))
    sfx = "" if dp == 64 else f"_dp{dp}"
    idx_cache = f"/tmp/diskann_bench_idx_s0_c4096_sig0.35_{N}_{D}_R{r_deg}{sfx}"
    if os.path.isdir(idx_cache) and not os.environ.get("QPS_REBUILD"):
        x = None
        t0 = time.time()
        idx = GraphIndex.load(idx_cache, search_batch_size=NQ)
        LOG(f"[qps] index loaded in {time.time()-t0:.0f}s")
    else:
        cfg = GraphConfig(
            max_degree=r_deg, l_build=100, alpha=1.2, beam_width=4,
            router_size=rsz,
            build_max_hops=int(os.environ.get("QPS_BMH", 24)) or None,
            max_occlusion_size=int(os.environ.get("QPS_OCC", 256)),
        )
        x = np.asarray(x)
        t0 = time.time()
        idx = GraphIndex.build(
            x, cfg, insert_batch_size=8192, search_batch_size=NQ,
            build_mode="packed", packed_dp=dp,
        )
        LOG(f"[qps] build {time.time()-t0:.0f}s ({N/(time.time()-t0):.0f} pts/s)")
        if os.environ.get("QPS_SAVE") and not os.path.isdir(idx_cache):
            t0 = time.time()
            idx.save(idx_cache)
            LOG(f"[qps] saved to {idx_cache} ({time.time()-t0:.0f}s)")
    qn = np.asarray(q)

    import dataclasses

    base_cfg = idx.config
    results = []
    for c in CONFIGS:
        (l, w, mh, rl, _legacy_fused), rest = c[:5], c[5:]
        sbs = rest[0] if len(rest) > 0 and rest[0] else NQ
        qdt = rest[1] if len(rest) > 1 and rest[1] else None
        router_off = bool(rest[2]) if len(rest) > 2 else False
        # rest[3]: router table size / rest[4]: router_starts override
        r_kw = {}
        if router_off:
            r_kw["router_size"] = 0
        elif len(rest) > 3 and rest[3]:
            r_kw["router_size"] = int(rest[3])
        if len(rest) > 4 and rest[4]:
            r_kw["router_starts"] = int(rest[4])
        new_cfg = dataclasses.replace(base_cfg, **r_kw) if r_kw else base_cfg
        if new_cfg is not idx.config and new_cfg != idx.config:
            idx._invalidate_start()  # resample the router table
        idx.config = new_cfg
        idx.search_batch_size = sbs
        p_ms = probe()
        kw = dict(l_search=l, mode="packed", beam_width=w,
                  rerank_l=rl, max_hops=mh,
                  query_dtype=np.dtype(qdt) if qdt else None)
        try:
            idx.search(qn, K, **kw)  # compile
            t0 = time.time()
            _, ids, stats = idx.search(qn, K, **kw)
            dt = time.time() - t0
        except Exception as e:
            LOG(f"[qps] L={l} W={w} mh={mh} rl={rl}: "
                f"FAILED {type(e).__name__}: {e}")
            continue
        r = knn_recall(ids, gt, K)
        row = {"l": l, "w": w, "max_hops": mh, "rerank_l": rl,
               "sbs": sbs, "qdt": qdt, "router_off": router_off,
               "router": (idx.config.router_size, idx.config.router_starts),
               "recall": round(float(r), 4), "qps": round(NQ / dt),
               "hops": round(float(stats.hops.mean()), 1),
               "probe_ms": round(p_ms, 1)}
        results.append(row)
        LOG(f"[qps] {row}")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
