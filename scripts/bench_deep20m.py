"""DEEP-100M-row analogue at >HBM scale: merged sharded build + tiered
search of N=20M x 128 on one v5e chip.

The dataset (10.2GB f32) exceeds what a resident fat-row layout can serve
(min 4KB/point), so the HBM tier holds PQ ADC codes + adjacency (~5GB) and
full vectors stay host-side (`HostVectorStore`), exactly the reference disk
tier's shape: PQ-in-RAM traversal + sector-read rerank
(`diskann-disk/src/search/provider/disk_provider.rs:634-654,777-800`), with
the build sharded under an HBM budget like `MergedVamanaIndexBuilder`
(`diskann-disk/src/build/builder/core.rs:34-76`).

Writes /root/repo/BENCH_DEEP20M_r03.json (BENCH-shaped artifact).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
       scripts/bench_deep20m.py > /tmp/deep20m.log 2>&1 &
Env: DEEP_N (20_000_000), DEEP_SHARDS (28), DEEP_R (40), DEEP_NQ (1024).
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
NC = 32768           # mixture components
SIGMA = 0.35
FBIN = f"/tmp/deep_{N}_{D}.fbin"
QNPY = f"/tmp/deep_{N}_{D}_q{NQ}.npy"
GTNPY = f"/tmp/deep_{N}_{D}_gt{NQ}_k{K}.npy"
OUT = "/root/repo/BENCH_DEEP20M_r03.json"


def gen_data():
    """Generate the clustered dataset on device in 1M chunks, stream to an
    .fbin on disk (the host array never exists whole in RAM)."""
    if os.path.exists(FBIN) and os.path.getsize(FBIN) == 8 + N * D * 4 \
            and os.path.exists(QNPY):
        LOG("dataset cached")
        return
    key = jax.random.key(7)
    kc, kq1, kq2 = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (NC, D), jnp.float32)
    chunk = 1_000_000
    assert N % chunk == 0, f"DEEP_N must be a multiple of {chunk}"

    @jax.jit
    def make(k1):
        ka, kb = jax.random.split(k1)
        a = jax.random.randint(ka, (chunk,), 0, NC)
        return centers[a] + SIGMA * jax.random.normal(kb, (chunk, D))

    t0 = time.time()
    with open(FBIN, "wb") as f:
        np.array([N, D], np.int32).tofile(f)
        for i in range(N // chunk):
            xc = np.asarray(make(jax.random.fold_in(key, i)), np.float32)
            xc.tofile(f)
            if i % 4 == 0:
                LOG(f"gen chunk {i+1}/{N//chunk} ({time.time()-t0:.0f}s)")
    aq = jax.random.randint(kq1, (NQ,), 0, NC)
    q = centers[aq] + SIGMA * jax.random.normal(kq2, (NQ, D), jnp.float32)
    np.save(QNPY, np.asarray(q, np.float32))
    LOG(f"dataset written in {time.time()-t0:.0f}s")


def groundtruth():
    """Exact top-K on-chip: the 10.2GB vector array fits HBM by itself."""
    if os.path.exists(GTNPY):
        LOG("groundtruth cached")
        return
    from diskann_tpu.io_.fbin import read_fbin
    from diskann_tpu import FlatIndex, Metric

    q = np.load(QNPY)
    t0 = time.time()
    vecs = read_fbin(FBIN, mmap=True)
    # upload in slabs to one preallocated device buffer
    dev = jnp.zeros((N, D), jnp.float32)
    upd = jax.jit(
        lambda b, c, o: jax.lax.dynamic_update_slice(b, c, (o, jnp.int32(0))),
        donate_argnums=(0,),
    )
    slab = 1 << 21
    prev = None
    for off in range(0, N, slab):
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
    vecs = read_fbin(FBIN, mmap=True)

    cfg = GraphConfig(
        max_degree=R, l_build=64, alpha=1.2, beam_width=4,
        build_max_hops=12, max_occlusion_size=256,
    )
    t0 = time.time()
    tiered = build_merged(
        vecs, cfg,
        n_shards=SHARDS, overlap=2, dp=32, insert_batch_size=8192,
        codes="pq", pq_chunks=32, verbose=True,
    )
    build_s = time.time() - t0
    LOG(f"merged build: {build_s:.0f}s ({N/build_s:.0f} pts/s)")
    # swap the in-RAM store for the file-backed native store (mmap + LRU)
    tiered.store = HostVectorStore.from_fbin(FBIN, cache_rows=1 << 20)
    tiered.io_limit = 64

    rows = []
    best = None
    for l in (60, 90, 120, 160):
        t0 = time.time()
        _, ids, _ = tiered.search_batched(
            q, K, l_search=l, beam_width=4, batch_size=1024, mode="pq",
        )
        dt = time.time() - t0
        t0 = time.time()
        _, ids, _ = tiered.search_batched(
            q, K, l_search=l, beam_width=4, batch_size=1024, mode="pq",
        )
        dt = time.time() - t0
        r = knn_recall(ids, gt, K)
        row = {"l": l, "recall": round(r, 4), "qps": round(NQ / dt),
               "io": dict(tiered.io_stats)}
        rows.append(row)
        LOG(json.dumps(row))
        if r >= 0.9 and (best is None or row["qps"] > best["qps"]):
            best = row
        if r >= 0.995:
            break

    top = best or max(rows, key=lambda r: r["recall"])
    out = {
        "metric": "deep20m_tiered_qps_at_recall0.9",
        "value": top["qps"], "unit": "qps",
        "extra": {
            "n": N, "d": D, "recall": top["recall"], "config": f"L={top['l']}",
            "build_s": round(build_s, 1),
            "build_points_per_s": round(N / build_s),
            "n_shards": SHARDS, "overlap": 2, "codes": "pq32",
            "hbm_tier_bytes": int(N * (32 + 4 * (cfg.max_degree_with_slack))),
            "io_stats": dict(tiered.io_stats),
            "sweep": rows,
        },
    }
    with open(OUT, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
