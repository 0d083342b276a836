"""100M-class tier proof at 50M x 128 on one v5e: merged sharded build
(checkpointed, resumable) + PQ-codes-in-HBM traversal + host-staged rerank.

The reference disk tier exists for beyond-RAM datasets
(`diskann-disk/src/search/provider/disk_provider.rs:634-654` PQ-in-RAM
traversal); the repo's 20M artifact (BENCH_DEEP20M_r04.json) proved the
recipe with full-dim SQ codes (6.4GB at 50M — too big next to adjacency),
so this run uses the PQ ADC representation the tier was built for:
- codes="pq", 64 chunks x 16 centers (4-bit fused masked-ADC): 3.2GB.
- adjacency truncated to R=40 columns (adj_width): 8GB (52-col slack
  would be 10.4GB and is pure waste in a read-only tier).
- router entry points (64k sampled rows), ONE composed dispatch per batch,
  f16 row wire for the staged rerank.
- build checkpoint_dir: the ~80-shard build survives relay wedges; a
  restart skips completed shards.

Writes /root/repo/BENCH_DEEP50M_r05.json with recall@10, QPS, build time,
and the HBM budget, honest metric name if the 0.90 bar is not met.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
       scripts/bench_deep50m.py > /tmp/deep50m.log 2>&1 &
Env: DEEP_N (50_000_000), DEEP_SHARDS (80), DEEP_R (40), DEEP_NQ (1024),
     DEEP_SKIP_BUILD=1 (reuse saved index), DEEP_LS / DEEP_RLS.
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/root/repo/.cache/xla_bench"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

LOG = lambda *a: print("[deep50]", *a, file=sys.stderr, flush=True)

N = int(os.environ.get("DEEP_N", 50_000_000))
D = 128
NQ = int(os.environ.get("DEEP_NQ", 1024))
K = 10
SHARDS = int(os.environ.get("DEEP_SHARDS", 60))  # ~1.67M pts/shard, the
# same shard size the proven 20M run used (24 shards x 1.67M, r04); fewer
# shards also cut the ~60s/shard fixed overhead (compile reuse, merges)
R = int(os.environ.get("DEEP_R", 40))
NC = 32768           # mixture components
SIGMA = 0.35
NFULL = 50_000_000
_BASE = "/root/repo/.cache/deep50"   # repo-local (gitignored), survives /tmp wipes
FBIN = f"{_BASE}/deep_{NFULL}_{D}.fbin"
QNPY = f"{_BASE}/deep_{NFULL}_{D}_q{NQ}.npy"
GTNPY = f"{_BASE}/deep_{N}_{D}_gt{NQ}_k{K}.npy"
IDXDIR = f"{_BASE}/deep_idx_{N}_pq4_R{R}_s{SHARDS}"
CKPT = f"{_BASE}/ckpt_{N}_R{R}_s{SHARDS}"
OUT = os.environ.get("DEEP_OUT", "/root/repo/BENCH_DEEP50M_r05.json")


def gen_data():
    """Generate the clustered dataset on device in 1M chunks, stream to an
    .fbin on disk (the host array never exists whole in RAM)."""
    os.makedirs(os.path.dirname(FBIN), exist_ok=True)
    if os.path.exists(FBIN) and os.path.getsize(FBIN) == 8 + NFULL * D * 4 \
            and os.path.exists(QNPY):
        LOG("dataset cached")
        return
    key = jax.random.key(7)
    kc, kq1, kq2 = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (NC, D), jnp.float32)
    chunk = 1_000_000

    @jax.jit
    def make(k1):
        ka, kb = jax.random.split(k1)
        a = jax.random.randint(ka, (chunk,), 0, NC)
        return centers[a] + SIGMA * jax.random.normal(kb, (chunk, D))

    t0 = time.time()
    with open(FBIN, "wb") as f:
        np.array([NFULL, D], np.int32).tofile(f)
        for i in range(NFULL // chunk):
            xc = np.asarray(make(jax.random.fold_in(key, i)), np.float32)
            xc.tofile(f)
            if i % 8 == 0:
                LOG(f"gen chunk {i+1}/{NFULL//chunk} ({time.time()-t0:.0f}s)")
    aq = jax.random.randint(kq1, (NQ,), 0, NC)
    q = centers[aq] + SIGMA * jax.random.normal(kq2, (NQ, D), jnp.float32)
    np.save(QNPY, np.asarray(q, np.float32))
    LOG(f"dataset written in {time.time()-t0:.0f}s")


def groundtruth():
    """Exact top-K by streaming slabs through the chip: 50M x 128 f32 is
    1.6x HBM, so each 4M-row slab scans on device and the per-slab top-K
    merge on host (one concat + argsort over 13 x K columns)."""
    if os.path.exists(GTNPY):
        LOG("groundtruth cached")
        return
    from diskann_tpu import FlatIndex, Metric
    from diskann_tpu.io_.fbin import read_fbin

    q = np.load(QNPY)
    vecs = read_fbin(FBIN, mmap=True)
    slab = 1 << 22
    all_d, all_i = [], []
    t0 = time.time()
    for off in range(0, N, slab):
        xd = jnp.asarray(np.asarray(vecs[off:off + slab], np.float32))
        flat = FlatIndex(xd, Metric.L2)
        d_s, i_s = flat.search(q, k=K, chunk=256)
        all_d.append(np.asarray(d_s))
        all_i.append(np.asarray(i_s).astype(np.int64) + off)
        del flat, xd
        gc.collect()
        LOG(f"gt slab {off//slab + 1}/{(N+slab-1)//slab} "
            f"({time.time()-t0:.0f}s)")
    ds = np.concatenate(all_d, axis=1)
    iid = np.concatenate(all_i, axis=1)
    order = np.argsort(ds, axis=1, kind="stable")[:, :K]
    gt = np.take_along_axis(iid, order, axis=1)
    np.save(GTNPY, gt)
    LOG(f"groundtruth in {time.time()-t0:.0f}s")


def main():
    from diskann_tpu import GraphConfig
    from diskann_tpu.bench.recall import knn_recall
    from diskann_tpu.io_.fbin import read_fbin
    from diskann_tpu.tiered.index import HostVectorStore, TieredIndex
    from diskann_tpu.tiered.merged_build import build_merged

    gen_data()
    groundtruth()
    q = np.load(QNPY)
    gt = np.load(GTNPY)
    vecs = read_fbin(FBIN, mmap=True)[:N]

    cfg = GraphConfig(
        max_degree=R, l_build=64, alpha=1.2, beam_width=4,
        build_max_hops=12, max_occlusion_size=256,
    )
    build_s = None
    if os.environ.get("DEEP_SKIP_BUILD") == "1" and os.path.isdir(IDXDIR):
        LOG(f"loading saved index from {IDXDIR}")
        t0 = time.time()
        tiered = TieredIndex.load(IDXDIR)
        LOG(f"index loaded in {time.time()-t0:.0f}s")
    else:
        t0 = time.time()
        tiered = build_merged(
            vecs, cfg,
            n_shards=SHARDS, overlap=2, dp=32, insert_batch_size=8192,
            verbose=True, codes="pq", pq_chunks=64, pq_centers=16,
            adj_width=R, checkpoint_dir=CKPT,
        )
        build_s = time.time() - t0
        LOG(f"merged build: {build_s:.0f}s ({N/build_s:.0f} pts/s)")
        if os.environ.get("DEEP_SAVE", "1") == "1":
            t0 = time.time()
            try:
                tiered.store.source_path = FBIN
                tiered.save(IDXDIR, copy_vectors=False)
                LOG(f"index saved to {IDXDIR} in {time.time()-t0:.0f}s")
            except Exception as e:
                LOG(f"index save failed: {type(e).__name__}: {e}")
    tiered.store = HostVectorStore.from_fbin(FBIN, cache_rows=1 << 20)
    tiered.store.n = N
    tiered.io_limit = None
    tiered.attach_router(size=65536)
    LOG("router attached (64k sampled entry rows)")
    try:
        stats = jax.devices()[0].memory_stats() or {}
        hbm_gb = round(stats.get("bytes_in_use", 0) / (1 << 30), 2)
    except Exception:
        hbm_gb = None
    LOG(f"HBM in use: {hbm_gb} GB")

    ls = [int(v) for v in os.environ.get("DEEP_LS", "40,80,160").split(",")]
    rls = [int(v) for v in os.environ.get("DEEP_RLS", "16,64").split(",")]
    rows = []
    best = None
    for l in ls:
        for rl in rls:
            if rl > l:
                continue
            kw = dict(l_search=l, beam_width=4, batch_size=1024,
                      rerank_l=rl, router_starts=4, row_wire=np.float16)
            t0 = time.time()
            _, ids, _ = tiered.search_batched(q, K, **kw)   # compile+warm
            _ = time.time() - t0
            t0 = time.time()
            _, ids, _ = tiered.search_batched(q, K, **kw)
            dt = time.time() - t0
            r = knn_recall(ids, gt, K)
            row = {"l": l, "rl": rl, "recall": round(r, 4),
                   "qps": round(NQ / dt)}
            rows.append(row)
            LOG(json.dumps(row))
            if r >= 0.9 and (best is None or row["qps"] > best["qps"]):
                best = row
        _, ids_l, _ = tiered.search_batched(
            q, K, l_search=l, beam_width=4, batch_size=1024,
            rerank_l=l, router_starts=4,
        )
        rlist = knn_recall(ids_l, gt, K)
        rows.append({"l": l, "rl": l, "recall": round(rlist, 4),
                     "qps": None,
                     "note": "traversal ceiling (rerank over full L list)"})
        LOG(f"traversal ceiling @L={l}: recall={rlist:.4f}")
        if rlist >= 0.995 and best is not None:
            break

    met = best is not None
    top = best or max((r for r in rows if r["qps"]), key=lambda r: r["recall"])
    out = {
        "metric": ("deep50m_tiered_qps_at_recall0.9" if met
                   else "deep50m_tiered_best_recall (0.9 bar NOT met)"),
        "value": top["qps"] if met else top["recall"],
        "unit": "qps" if met else "recall@10",
        "extra": {
            "n": N, "d": D, "recall": top["recall"],
            "config": f"L={top['l']},rl={top['rl']},codes=pq64x16",
            "build_s": round(build_s, 1) if build_s else None,
            "build_points_per_s": round(N / build_s) if build_s else None,
            "n_shards": SHARDS, "overlap": 2, "adj_width": R,
            "codes": "pq 64 chunks x 16 centers (4-bit fused ADC), 3.2GB",
            "hbm_in_use_gb": hbm_gb,
            "router": "64k sampled, 4 starts/query",
            "io_stats": dict(tiered.io_stats),
            "sweep": rows,
        },
    }
    with open(OUT, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
