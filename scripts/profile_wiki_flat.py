"""Profile the flat exact scan at the wiki100k shape (100k x 768, IP).

Measures the round-4 FlatIndex rewrites on the chip:
- f32 exact scan with per-chunk lax.top_k (was: full-width concat sort)
- bf16 shortlist (approx_min_k) + exact f32 rerank

Warmup is at the FULL timed batch shape (the prior sweep warmed at 256
queries and timed 4096 — a different program).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_wiki_flat.py
Env: WIKI_N (100_000), WIKI_NQ (4096).
"""

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

import numpy as np  # noqa: E402

LOG = lambda *a: print("[wflat]", *a, file=sys.stderr, flush=True)

N = int(os.environ.get("WIKI_N", 100_000))
NQ = int(os.environ.get("WIKI_NQ", 4096))


def main():
    from diskann_tpu import FlatIndex, Metric

    sys.path.insert(0, "/root/repo/scripts")
    from bench_wiki100k import make_embeddings

    LOG(f"generating {N} x 768 unit embeddings (device)")
    x_dev, q_dev = make_embeddings(42, N, NQ)
    qn = np.asarray(q_dev)
    del q_dev
    gt_cache = f"/tmp/wiki_gt_{N}_{NQ}.npy"
    gt = np.load(gt_cache) if os.path.exists(gt_cache) else None

    flat = FlatIndex(x_dev, metric=Metric.InnerProduct)
    from diskann_tpu.bench.recall import knn_recall

    for compute in ("f32", "bf16"):
        t0 = time.time()
        _, ids = flat.search(qn, 100, compute=compute)  # compile at NQ
        LOG(f"{compute}: warm call (incl compile) {time.time()-t0:.2f}s")
        reps = []
        for _ in range(3):
            t0 = time.time()
            _, ids = flat.search(qn, 100, compute=compute)
            reps.append(round(time.time() - t0, 3))
        best = min(reps)
        rec = knn_recall(ids, gt, 100) if gt is not None else float("nan")
        LOG(f"{compute}: reps={reps}s qps={NQ/best:.0f} recall@100={rec:.4f}")


if __name__ == "__main__":
    main()
