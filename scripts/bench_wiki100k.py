"""Second benchmark workload — the reference CI shape: d=768 embeddings,
InnerProduct metric, quantized traversal (SQ / PQ / packed), recall@100
(`diskann-benchmark/perf_test_inputs/wikipedia-100K-disk-index.json:9-36`:
100k x 768, IP, R=59 L_build=80, SQ_1_2.0 + 192 PQ chunks, search_list=200,
beam 4).  De-overfits the round-2 constants: the headline knobs
(max_hops=9, router 4 starts, occ=256, build_max_hops=12) are re-validated
on this distribution and reported per-mode.

Synthetic embedding-like data: clustered 64-d latents lifted through a
fixed random 64->768 projection, unit-normalized (IP == cosine geometry).

Round-4 fix (VERDICT r3 item 3: recall@100 stalled at 0.9833 under a
bounded hop cap): the r3 graph was BUILT navigating packed dp=128-of-768
codes — a 6x dimensionality truncation during build that degrades every
edge choice at d=768/IP.  100k x 768 f32 is only 307MB, so the build now
runs full-precision (exact distances for candidate search AND prune);
the quantized representations are attached after for SEARCH only.

Writes /root/repo/BENCH_WIKI100K_r04.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
       scripts/bench_wiki100k.py > /tmp/wiki100k.log 2>&1 &
Env: WIKI_N (100_000), WIKI_NQ (4096), WIKI_BUILD (full | packed).
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
BUILD = os.environ.get("WIKI_BUILD", "full")
D, DLAT, NC = 768, 64, 1024
OUT = os.environ.get("WIKI_OUT", "/root/repo/BENCH_WIKI100K_r04.json")


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
    build_kw = (
        dict(build_mode="packed", packed_dp=128) if BUILD == "packed"
        else dict(build_mode="full")
    )
    LOG(f"building ({BUILD}; exact distances when full)")
    t0 = time.time()
    idx = GraphIndex.build(
        x_dev, cfg, insert_batch_size=8192, search_batch_size=2048,
        **build_kw,
    )
    build_s = time.time() - t0
    LOG(f"build {build_s:.0f}s ({N/build_s:.0f} pts/s)")
    x = np.asarray(x_dev)
    del x_dev

    LOG("attaching packed dp=128 + SQ (int8 768) + PQ (192 chunks)")
    if idx.packed is None:
        idx.attach_packed(dp=128)
    idx.attach_sq()
    idx.attach_pq(n_chunks=192)

    results = []
    # the reference gates recall@100 at search_list=200 beam=4 on this
    # shape; sweep bounded hop caps (mh<=16) against free-running per mode
    for mode in ("packed", "sq", "pq"):
        for label, mh in (("mh9", 9), ("mh12", 12), ("mh16", 16),
                          ("free", None)):
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

    # the round-4 bar: recall@100 >= 0.995 under a BOUNDED hop cap
    ok = [r for r in results
          if r["recall@100"] >= 0.995 and r["hop_cap"] != "free"]
    top = max(ok, key=lambda r: r["qps"]) if ok else max(
        results, key=lambda r: r["recall@100"]
    )
    out = {
        "metric": ("wiki100k_768d_ip_qps_at_recall100@0.995_boundedhops"
                   if ok else
                   "wiki100k_768d_ip_best_recall100 (0.995 bar NOT met)"),
        "value": top["qps"] if ok else top["recall@100"],
        "unit": "qps" if ok else "recall@100",
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
