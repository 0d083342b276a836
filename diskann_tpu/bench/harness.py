"""Reusable measurement harnesses (replaces `diskann-benchmark-core`):
parallel build timing, search sweeps with recall + latency percentiles, and
the standard benchmark family registrations."""

from __future__ import annotations

import time

import numpy as np

from diskann_tpu.bench.recall import knn_recall
from diskann_tpu.bench.registry import Registry
from diskann_tpu.bench.stats import percentile_summary
from diskann_tpu.flat.index import FlatIndex
from diskann_tpu.graph.config import GraphConfig
from diskann_tpu.graph.index import GraphIndex
from diskann_tpu.ops.distance import Metric


def make_clustered(seed, n, nq, d, n_clusters=1024, sigma=0.3, device=False):
    """Synthetic clustered dataset (queries drawn from the same mixture).
    With device=True generation happens on-accelerator (avoids slow host
    uploads for large N)."""
    if device:
        import jax
        import jax.numpy as jnp

        k0, k1, k2, k3, k4 = jax.random.split(jax.random.key(seed), 5)
        centers = jax.random.normal(k0, (n_clusters, d), jnp.float32)
        a = jax.random.randint(k1, (n,), 0, n_clusters)
        x = centers[a] + sigma * jax.random.normal(k2, (n, d), jnp.float32)
        aq = jax.random.randint(k3, (nq,), 0, n_clusters)
        q = centers[aq] + sigma * jax.random.normal(k4, (nq, d), jnp.float32)
        return x, q
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    a = rng.integers(0, n_clusters, size=n)
    x = centers[a] + sigma * rng.standard_normal((n, d)).astype(np.float32)
    aq = rng.integers(0, n_clusters, size=nq)
    q = centers[aq] + sigma * rng.standard_normal((nq, d)).astype(np.float32)
    return x, q


def run_build(vectors, config: GraphConfig, *, insert_batch_size=1024, **kw) -> dict:
    t0 = time.time()
    idx = GraphIndex.build(
        vectors, config, insert_batch_size=insert_batch_size, **kw
    )
    dt = time.time() - t0
    return {
        "index": idx,
        "build_s": dt,
        "points_per_s": len(vectors) / dt if dt > 0 else float("inf"),
    }


def run_search_sweep(
    index: GraphIndex,
    queries: np.ndarray,
    gt_ids: np.ndarray,
    *,
    k: int = 10,
    l_values=(20, 50, 100),
    mode: str = "full",
    beam_width: int | None = None,
    repeats: int = 3,
) -> list[dict]:
    """QPS / recall / latency for each search-list size L (the reference's
    graph-search benchmark shape, `diskann-benchmark/example/graph-index.json`)."""
    out = []
    b = len(queries)
    for l in l_values:
        # warmup (compile)
        index.search(queries[: min(64, b)], k, l_search=l, mode=mode,
                     beam_width=beam_width)
        lat = []
        ids = None
        for _ in range(repeats):
            t0 = time.time()
            _, ids, stats = index.search(
                queries, k, l_search=l, mode=mode, beam_width=beam_width
            )
            lat.append(time.time() - t0)
        dt = min(lat)
        out.append({
            "l_search": l,
            "k": k,
            "mode": mode,
            "recall": knn_recall(ids, gt_ids, k),
            "qps": b / dt,
            "mean_cmps": float(stats.cmps.mean()),
            "mean_hops": float(stats.hops.mean()),
            "latency": percentile_summary(np.array([dt / b] * 1)),
        })
    return out


# ----------------------------------------------------------- registrations
def default_registry() -> Registry:
    """The shipped benchmark families (replaces `diskann-benchmark`'s
    registry, `src/main.rs:17-60`)."""
    reg = Registry()

    def graph_index_job(job: dict) -> dict:
        n = job.get("n", 100_000)
        d = job.get("dim", 64)
        nq = job.get("n_queries", 1000)
        cfg = GraphConfig(
            max_degree=job.get("max_degree", 32),
            l_build=job.get("l_build", 64),
            alpha=job.get("alpha", 1.2),
            metric=Metric(job.get("metric", "l2")),
        )
        x, q = make_clustered(
            job.get("seed", 0), n, nq, d, device=job.get("device_data", True)
        )
        built = run_build(
            x, cfg, insert_batch_size=job.get("insert_batch_size", 1024)
        )
        idx = built.pop("index")
        flat = FlatIndex(x, cfg.metric)
        _, gt = flat.search(q, k=job.get("k", 10))
        sweeps = run_search_sweep(
            idx, np.asarray(q), gt,
            k=job.get("k", 10),
            l_values=tuple(job.get("search_l", (20, 50, 100))),
            mode=job.get("search_mode", "full"),
            beam_width=job.get("beam_width"),
        )
        return {"build": built, "search": sweeps}

    def flat_job(job: dict) -> dict:
        n = job.get("n", 100_000)
        d = job.get("dim", 64)
        nq = job.get("n_queries", 1000)
        x, q = make_clustered(job.get("seed", 0), n, nq, d,
                              device=job.get("device_data", True))
        flat = FlatIndex(x, Metric(job.get("metric", "l2")))
        flat.search(np.asarray(q)[:8], k=job.get("k", 10))  # compile
        t0 = time.time()
        flat.search(q, k=job.get("k", 10))
        dt = time.time() - t0
        return {"qps": nq / dt, "recall": 1.0}

    def filters_job(job: dict) -> dict:
        """Filtered-search family (reference `diskann-benchmark/src/filters`)."""
        rng = np.random.default_rng(job.get("seed", 0))
        n = job.get("n", 20_000)
        d = job.get("dim", 32)
        nq = job.get("n_queries", 200)
        labels = job.get("labels", ["red", "green", "blue", "round"])
        predicate = job.get("predicate", labels[0])
        x, q = make_clustered(job.get("seed", 0), n, nq, d)
        cfg = GraphConfig(
            max_degree=job.get("max_degree", 32),
            l_build=job.get("l_build", 64),
        )
        idx = GraphIndex.build(
            x, cfg, insert_batch_size=job.get("insert_batch_size", 1024)
        )
        per_point = [
            [l for l in labels if rng.random() < 0.3] for _ in range(n)
        ]
        idx.attach_labels(per_point)
        k = job.get("k", 10)
        # exact filtered groundtruth by brute force over matching points
        from diskann_tpu.filters import parse_predicate
        from diskann_tpu.filters.compile import compile_accept
        import jax.numpy as jnp

        pred = parse_predicate(predicate)
        accept = compile_accept(pred, idx.labels.vocab, idx.state.capacity)
        match = np.asarray(
            accept(idx.labels.bits, jnp.arange(idx.state.capacity),
                   jnp.ones((idx.state.capacity,), bool))
        )[:n]
        sub = np.nonzero(match)[0]
        flat = FlatIndex(x[sub], cfg.metric)
        _, gt_local = flat.search(q, k=k)
        gt = np.where(gt_local >= 0, sub[np.clip(gt_local, 0, len(sub) - 1)], -1)
        idx.search_filtered(q[:8], predicate, k)  # compile
        t0 = time.time()
        _, ids, stats = idx.search_filtered(
            q, predicate, k, l_search=job.get("search_l", 100),
            method=job.get("method", "inline"),
        )
        dt = time.time() - t0
        return {
            "selectivity": float(match.mean()),
            "recall": knn_recall(ids, gt, k),
            "qps": nq / dt,
            "mean_cmps": float(stats.cmps.mean()),
        }

    def multivec_job(job: dict) -> dict:
        """Multi-vector (Chamfer/MaxSim) family
        (reference `diskann-benchmark/src/multi_vector`)."""
        from diskann_tpu.ops.multivec import FlatMultiVectorIndex

        rng = np.random.default_rng(job.get("seed", 0))
        n_docs = job.get("n_docs", 2000)
        tpd = job.get("tokens_per_doc", 16)
        d = job.get("dim", 64)
        nq = job.get("n_queries", 50)
        docs = [rng.standard_normal((tpd, d)).astype(np.float32)
                for _ in range(n_docs)]
        qs = [rng.standard_normal((tpd, d)).astype(np.float32)
              for _ in range(nq)]
        idx = FlatMultiVectorIndex(docs, metric=job.get("kind", "maxsim"))
        idx.search(qs[:4], k=job.get("k", 10))  # compile
        t0 = time.time()
        idx.search(qs, k=job.get("k", 10))
        dt = time.time() - t0
        return {"qps": nq / dt, "n_docs": n_docs, "tokens_per_doc": tpd}

    def streaming_job(job: dict) -> dict:
        """Streaming churn family (reference
        `diskann-benchmark-core/src/streaming`): insert/delete/search steps."""
        from diskann_tpu.bench.runbook import RunbookExecutor

        n = job.get("n", 20_000)
        d = job.get("dim", 32)
        nq = job.get("n_queries", 200)
        x, q = make_clustered(job.get("seed", 0), n, nq, d)
        cfg = GraphConfig(
            max_degree=job.get("max_degree", 32),
            l_build=job.get("l_build", 64),
        )
        idx = GraphIndex(d, cfg, insert_batch_size=job.get(
            "insert_batch_size", 1024))
        ex = RunbookExecutor(idx, x, q, k=job.get("k", 10))
        steps = job.get("steps") or [
            {"operation": "insert", "start": 0, "end": n // 2},
            {"operation": "search"},
            {"operation": "delete", "start": 0, "end": n // 4},
            {"operation": "insert", "start": n // 2, "end": n},
            {"operation": "search"},
            {"operation": "consolidate"},
            {"operation": "search"},
        ]
        log = ex.run(steps)
        return {"log": log}

    from diskann_tpu.bench.kernels import kernels_job

    reg.register("graph-index", graph_index_job,
                 "build + search sweep on synthetic clustered data")
    reg.register("flat", flat_job, "brute-force scan throughput")
    reg.register("kernels", kernels_job,
                 "device-kernel microbenchmarks (SIMD-bench analogue)")
    reg.register("filters", filters_job,
                 "label-filtered search recall/QPS")
    reg.register("multi-vector", multivec_job,
                 "Chamfer/MaxSim multi-vector scan throughput")
    reg.register("streaming", streaming_job,
                 "streaming churn runbook with recall checkpoints")
    return reg
