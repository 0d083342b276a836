"""DEEP-100M-row analogue at >HBM scale: merged sharded build + tiered
search of N=20M x 128 on one v5e chip.

The dataset (10.2GB f32) exceeds what a resident fat-row layout can serve
(min 4KB/point), so the HBM tier holds compact traversal codes + adjacency
and full vectors stay host-side (`HostVectorStore`) — the reference disk
tier's shape: quantized-in-RAM traversal + sector-read rerank
(`diskann-disk/src/search/provider/disk_provider.rs:634-654,777-800`), with
the build sharded under an HBM budget like `MergedVamanaIndexBuilder`
(`diskann-disk/src/build/builder/core.rs:34-76`).

Round-4 recipe (the r3 run peaked at recall 0.60 — VERDICT r3 item 1):
- codes="sq": full-dimension int8 traversal codes ([N, d] i8 = 2.5GB at
  20M + adjacency ~4.2GB — fits HBM) make the walk ordering near-exact,
  the dp=128 lesson applied at >HBM scale.  DEEP_CODES=pq4/pq8 selects the
  PQ representations (pq4 = 64 chunks x 16 centers, fused masked-ADC).
- router entry points: each query starts from its nearest of 64k sampled
  rows (one MXU matmul) instead of one approximated medoid.
- io budget >= the rerank list; staged rows upload f16.
- ONE composed dispatch per batch (router + traversal + id pack).
- recall DECOMPOSITION per sweep row: `recall_in_list` (is the true
  neighbor anywhere in the staged top-`rl` list? = traversal+graph
  quality) vs final reranked recall (adds the rerank-budget loss).

Writes /root/repo/BENCH_DEEP20M_r04.json (BENCH-shaped artifact), with an
HONEST metric name: if no sweep row reaches recall 0.9 the metric says so
instead of reporting a below-bar QPS under the 0.9 label.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
       scripts/bench_deep20m.py > /tmp/deep20m.log 2>&1 &
Env: DEEP_N (20_000_000), DEEP_SHARDS (24), DEEP_R (40), DEEP_NQ (1024),
     DEEP_CODES (sq | pq4 | pq8), DEEP_SKIP_BUILD=1 (reuse saved index),
     DEEP_SAVE=1 (save the built index), DEEP_LS / DEEP_RLS (sweep lists).
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
    os.environ.get("JAX_CACHE_DIR", "/tmp/diskann_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

LOG = lambda *a: print("[deep]", *a, file=sys.stderr, flush=True)

N = int(os.environ.get("DEEP_N", 20_000_000))
D = 128
NQ = int(os.environ.get("DEEP_NQ", 1024))
K = 10
SHARDS = int(os.environ.get("DEEP_SHARDS", 24))
R = int(os.environ.get("DEEP_R", 40))
CODES = os.environ.get("DEEP_CODES", "sq")
NC = 32768           # mixture components
SIGMA = 0.35
NFULL = 20_000_000   # the cached full-size dataset (sliced when N < NFULL)
FBIN = f"/tmp/deep_{NFULL}_{D}.fbin"
QNPY = f"/tmp/deep_{NFULL}_{D}_q{NQ}.npy"
GTNPY = f"/tmp/deep_{N}_{D}_gt{NQ}_k{K}.npy"
IDXDIR = f"/tmp/deep_idx_{N}_{CODES}_R{R}_s{SHARDS}"
OUT = os.environ.get("DEEP_OUT", "/root/repo/BENCH_DEEP20M_r04.json")


def gen_data():
    """Generate the clustered dataset on device in 1M chunks, stream to an
    .fbin on disk (the host array never exists whole in RAM).  Always
    generates the FULL 20M file; smaller DEEP_N runs slice its prefix (the
    same distribution, no regeneration)."""
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
            if i % 4 == 0:
                LOG(f"gen chunk {i+1}/{NFULL//chunk} ({time.time()-t0:.0f}s)")
    aq = jax.random.randint(kq1, (NQ,), 0, NC)
    q = centers[aq] + SIGMA * jax.random.normal(kq2, (NQ, D), jnp.float32)
    np.save(QNPY, np.asarray(q, np.float32))
    LOG(f"dataset written in {time.time()-t0:.0f}s")


def groundtruth():
    """Exact top-K on-chip over the first N rows."""
    if os.path.exists(GTNPY):
        LOG("groundtruth cached")
        return
    from diskann_tpu.io_.fbin import read_fbin
    from diskann_tpu import FlatIndex, Metric

    q = np.load(QNPY)
    t0 = time.time()
    vecs = read_fbin(FBIN, mmap=True)[:N]
    # upload in slabs to one preallocated device buffer
    dev = jnp.zeros((N, D), jnp.float32)
    upd = jax.jit(
        lambda b, c, o: jax.lax.dynamic_update_slice(b, c, (o, jnp.int32(0))),
        donate_argnums=(0,),
    )
    slab = 1 << 21
    prev = None
    for off in range(0, N, slab):
        # a shorter tail chunk compiles one extra update program;
        # dynamic_update_slice clamps the start so it lands at N - len
        dev = upd(dev, jnp.asarray(np.asarray(vecs[off:off + slab])),
                  jnp.int32(off))
        if prev is not None:
            np.asarray(prev)
        prev = dev[:1, :1]
    LOG(f"upload {time.time()-t0:.0f}s")
    flat = FlatIndex(dev, Metric.L2)
    _, gt = flat.search(np.asarray(q), k=K, chunk=1 << 14)
    np.save(GTNPY, np.asarray(gt))
    del flat, dev
    gc.collect()
    LOG(f"groundtruth in {time.time()-t0:.0f}s")


def recall_in_list(stage_ids: np.ndarray, gt: np.ndarray) -> float:
    """Fraction of true top-K ids present ANYWHERE in each query's staged
    list — the traversal+graph recall ceiling before any rerank loss."""
    hits = 0
    for i in range(gt.shape[0]):
        hits += len(np.intersect1d(stage_ids[i], gt[i], assume_unique=False))
    return hits / gt.size


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
        codes_kw = {"sq": dict(codes="sq"),
                    "pq4": dict(codes="pq", pq_chunks=64, pq_centers=16),
                    "pq8": dict(codes="pq", pq_chunks=32, pq_centers=256)}
        t0 = time.time()
        tiered = build_merged(
            vecs, cfg,
            n_shards=SHARDS, overlap=2, dp=32, insert_batch_size=8192,
            verbose=True, **codes_kw[CODES],
        )
        build_s = time.time() - t0
        LOG(f"merged build: {build_s:.0f}s ({N/build_s:.0f} pts/s)")
        if os.environ.get("DEEP_SAVE", "1") == "1":
            t0 = time.time()
            try:
                # the store's vectors are a slice of the cached .fbin —
                # record that path instead of copying 10GB
                tiered.store.source_path = FBIN
                tiered.save(IDXDIR, copy_vectors=False)
                LOG(f"index saved to {IDXDIR} in {time.time()-t0:.0f}s")
            except Exception as e:
                LOG(f"index save failed: {type(e).__name__}: {e}")
    # swap the in-RAM store for the file-backed native store (mmap + LRU)
    tiered.store = HostVectorStore.from_fbin(FBIN, cache_rows=1 << 20)
    tiered.store.n = N          # sliced prefix of the full file
    tiered.io_limit = None      # stage the full rerank list (io >= rl)
    tiered.attach_router(size=65536)
    LOG("router attached (64k sampled entry rows)")

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
            # decomposition: rerun at rl=l to get the full traversal list
            row = {"l": l, "rl": rl, "codes": CODES,
                   "recall": round(r, 4), "qps": round(NQ / dt)}
            rows.append(row)
            LOG(json.dumps(row))
            if r >= 0.9 and (best is None or row["qps"] > best["qps"]):
                best = row
        # traversal-quality ceiling at this L: recall of the FULL L-list
        _, ids_l, _ = tiered.search_batched(
            q, K, l_search=l, beam_width=4, batch_size=1024,
            rerank_l=l, router_starts=4,
        )
        rlist = knn_recall(ids_l, gt, K)
        rows.append({"l": l, "rl": l, "codes": CODES,
                     "recall": round(rlist, 4), "qps": None,
                     "note": "traversal ceiling (rerank over full L list)"})
        LOG(f"traversal ceiling @L={l}: recall={rlist:.4f}")
        if rlist >= 0.995 and best is not None:
            break

    met = best is not None
    top = best or max((r for r in rows if r["qps"]), key=lambda r: r["recall"])
    out = {
        "metric": ("deep20m_tiered_qps_at_recall0.9" if met
                   else "deep20m_tiered_best_recall (0.9 bar NOT met)"),
        "value": top["qps"] if met else top["recall"],
        "unit": "qps" if met else "recall@10",
        "extra": {
            "n": N, "d": D, "recall": top["recall"],
            "config": f"L={top['l']},rl={top['rl']},codes={CODES}",
            "build_s": round(build_s, 1) if build_s else None,
            "build_points_per_s": round(N / build_s) if build_s else None,
            "n_shards": SHARDS, "overlap": 2, "codes": CODES,
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
