"""Second benchmark workload — the reference CI shape: d=768 embeddings,
InnerProduct metric, quantized traversal (SQ / PQ / packed), recall@100
(`diskann-benchmark/perf_test_inputs/wikipedia-100K-disk-index.json:9-36`:
100k x 768, IP, R=59 L_build=80, SQ_1_2.0 + 192 PQ chunks, search_list=200,
beam 4).  De-overfits the round-2 constants: the headline knobs
(max_hops=9, router 4 starts, occ=256, build_max_hops=12) are re-validated
on this distribution and reported per-mode.

Synthetic embedding-like data: clustered 64-d latents lifted through a
fixed random 64->768 projection, unit-normalized (IP == cosine geometry).

Writes /root/repo/BENCH_WIKI100K_r03.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
       scripts/bench_wiki100k.py > /tmp/wiki100k.log 2>&1 &
Env: WIKI_N (100_000), WIKI_NQ (4096).
"""

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

LOG = lambda *a: print("[wiki]", *a, file=sys.stderr, flush=True)

N = int(os.environ.get("WIKI_N", 100_000))
NQ = int(os.environ.get("WIKI_NQ", 4096))
D, DLAT, NC = 768, 64, 1024
OUT = "/root/repo/BENCH_WIKI100K_r03.json"


def make_embeddings(seed, n, nq):
    """Clustered latents -> random lift -> unit norm, all on device."""
    k0, k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(seed), 6)
    centers = jax.random.normal(k0, (NC, DLAT), jnp.float32)
    lift = jax.random.normal(k1, (DLAT, D), jnp.float32) / np.sqrt(DLAT)

    def emb(ka, kb, m):
        a = jax.random.randint(ka, (m,), 0, NC)
        z = centers[a] + 0.35 * jax.random.normal(kb, (m, DLAT), jnp.float32)
        e = z @ lift + 0.02 * jax.random.normal(
            jax.random.fold_in(kb, 1), (m, D), jnp.float32
        )
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    return emb(k2, k3, n), emb(k4, k5, nq)


def main():
    from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
    from diskann_tpu.bench.recall import knn_recall

    LOG(f"generating {N} x {D} unit embeddings (device)")
    x_dev, q_dev = make_embeddings(42, N, NQ)
    qn = np.asarray(q_dev)
    del q_dev

    k_eval = (10, 100)
    gt_cache = f"/tmp/wiki_gt_{N}_{NQ}.npy"
    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)
    else:
        LOG("exact IP groundtruth (flat scan)")
        flat = FlatIndex(x_dev, Metric.InnerProduct)
        _, gt = flat.search(qn, k=100)
        np.save(gt_cache, gt)
        del flat

    # reference CI build shape: R=59 -> 60, L_build=80, alpha=1.2
    cfg = GraphConfig(max_degree=60, l_build=80, alpha=1.2, beam_width=4,
                      metric=Metric.InnerProduct,
                      build_max_hops=12, max_occlusion_size=256)
    LOG("building (packed dp=128 of 768 = PCA int8)")
    t0 = time.time()
    idx = GraphIndex.build(
        x_dev, cfg, insert_batch_size=8192, search_batch_size=2048,
        build_mode="packed", packed_dp=128,
    )
    build_s = time.time() - t0
    LOG(f"build {build_s:.0f}s ({N/build_s:.0f} pts/s)")
    x = np.asarray(x_dev)
    del x_dev

    LOG("attaching SQ (int8 768) + PQ (192 chunks)")
    idx.attach_sq()
    idx.attach_pq(n_chunks=192)

    results = []
    # constants-transfer check: the 1M-tuned defaults (mh=9, rs=4) vs
    # free-running (mh=None) on THIS distribution, per quantized mode
    for mode in ("packed", "sq", "pq"):
        for label, mh in (("mh9", 9), ("free", None)):
            for l in (100, 200):
                try:
                    idx.search(qn[:256], 100, l_search=l, mode=mode,
                               max_hops=mh, query_dtype=np.float16)
                    t0 = time.time()
                    _, ids, stats = idx.search(
                        qn, 100, l_search=l, mode=mode, max_hops=mh,
                        query_dtype=np.float16,
                    )
                    dt = time.time() - t0
                except Exception as e:
                    LOG(f"{mode}/{label}/L={l}: {type(e).__name__}: {e}")
                    continue
                row = {
                    "mode": mode, "hop_cap": label, "l": l,
                    "recall@10": round(knn_recall(ids, gt, 10), 4),
                    "recall@100": round(knn_recall(ids, gt, 100), 4),
                    "qps": round(NQ / dt),
                    "hops": round(float(stats.hops.mean()), 1),
                }
                results.append(row)
                LOG(json.dumps(row))

    ok = [r for r in results if r["recall@100"] >= 0.95]
    top = max(ok, key=lambda r: r["qps"]) if ok else max(
        results, key=lambda r: r["recall@100"]
    )
    out = {
        "metric": "wiki100k_768d_ip_qps_at_recall100@0.95",
        "value": top["qps"], "unit": "qps",
        "extra": {
            "n": N, "d": D, "metric_kind": "inner_product",
            "build_s": round(build_s, 1),
            "build_points_per_s": round(N / build_s),
            "best": top, "sweep": results,
            "reference_shape":
                "wikipedia-100K-disk-index.json: d=768 IP R=59 L=80 "
                "SQ+PQ192 search_list=200 beam=4 recall@100",
        },
    }
    with open(OUT, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
