"""Streaming churn at 1M on the chip: 10 cycles of 5% delete + 5% insert
(50% total churn) with a recall checkpoint per cycle — the Fresh/IP-DiskANN
streaming workload (`diskann-benchmark-core/src/streaming/graph/
inplace_delete.rs`, BigANN runbook shape `executors/bigann/runbook.rs`).

Writes /root/repo/BENCH_STREAM1M_r04.json: recall trajectory, inserts/s,
deletes/s, per-cycle wall times.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
       scripts/bench_stream1m.py > /tmp/stream1m.log 2>&1 &
Env: STREAM_N (1_000_000), STREAM_CYCLES (10), STREAM_FRAC (0.05),
     STREAM_DELETE_METHOD (scan | two_hop_one_hop | visited_topk),
     STREAM_REPAIR (prune | fill), STREAM_OUT.
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

LOG = lambda *a: print("[stream]", *a, file=sys.stderr, flush=True)

N = int(os.environ.get("STREAM_N", 1_000_000))
CYCLES = int(os.environ.get("STREAM_CYCLES", 10))
FRAC = float(os.environ.get("STREAM_FRAC", 0.05))
METHOD = os.environ.get("STREAM_DELETE_METHOD", "two_hop_one_hop")
# "fill" = the reference's patch-then-maybe-prune (index.rs:1558): no
# occlusion loop in the repair dispatch — the r04 scan+prune artifact
# measured 931 deletes/s, structurally capped by the ~2R-iteration
# lax-loop floor per 1024-row patch dispatch
REPAIR = os.environ.get("STREAM_REPAIR", "fill")
# replacement-candidate budget per patched row: at 5% churn the mean dead
# count per affected row is ~4.2, so max_dead=4 starves half the rows of
# replacements (r05 first run: recall_min 0.9356); 8 covers ~95%
MAX_DEAD = int(os.environ.get("STREAM_MAX_DEAD", 8))
D, NQ, K = 128, 2048, 10
OUT = os.environ.get("STREAM_OUT", "/root/repo/BENCH_STREAM1M_r05.json")


def main():
    from diskann_tpu import GraphConfig, GraphIndex
    from diskann_tpu.bench.harness import make_clustered
    from diskann_tpu.bench.runbook import RunbookExecutor

    step = int(N * FRAC)
    total = N + CYCLES * step
    LOG(f"generating {total} x {D} on device (churn pool)")
    x_dev, q_dev = make_clustered(11, total, NQ, D, n_clusters=4096,
                                  sigma=0.35, device=True)
    q = np.asarray(q_dev)
    del q_dev

    cfg = GraphConfig(max_degree=64, l_build=100, alpha=1.2, beam_width=4,
                      build_max_hops=12, max_occlusion_size=256)
    LOG(f"building initial index over {N} points (packed)")
    t0 = time.time()
    # Capacity = N + margin, NOT N + cycles*step: each cycle deletes before
    # it inserts, so freed slots recycle (per the freelist) and ns hovers at
    # ~N.  The margin only covers routing jitter.  This also keeps the
    # WRITABLE packed table under its 2^31 i32-word ceiling at dp=64
    # (cap 1.04M x 2048 words/row = 2.13G words).
    cap = N + int(os.environ.get("STREAM_CAP_MARGIN", 40_000))
    idx = GraphIndex.build(
        x_dev[:N], cfg, insert_batch_size=8192, search_batch_size=2048,
        build_mode="packed", packed_dp=64,
        capacity=cap,
    )
    build_s = time.time() - t0
    LOG(f"build {build_s:.0f}s ({N/build_s:.0f} pts/s)")

    # host copy for the executor (checkpoint groundtruth + churn inserts)
    LOG("downloading dataset to host for the executor")
    x = np.asarray(x_dev)
    del x_dev

    ex = RunbookExecutor(
        idx, x, q, k=K, l_search=90, delete_method=METHOD,
        delete_repair=REPAIR, delete_kwargs={"max_dead": MAX_DEAD},
        search_kwargs={"mode": "packed", "query_dtype": np.float16,
                       "max_hops": 9},
    )
    # adopt the pre-built points as tags 0..N
    for t in range(N):
        ex.tag_to_id[t] = t
        ex.tag_to_row[t] = t

    LOG(f"running {CYCLES} churn cycles of {step} del + {step} ins "
        f"(method={METHOD}, repair={REPAIR})")
    # one ex.run per cycle + a partial artifact after each: a relay wedge
    # mid-run (observed >=2h outages, CLAUDE.md) costs one cycle, not the
    # whole bench
    for c in range(CYCLES):
        lo = c * step
        # ex.run returns the executor's FULL accumulated log (not just this
        # cycle's entries) — assign, don't append, or every earlier cycle
        # is duplicated into the artifact and the summed rates are biased
        # toward the compile-heavy first cycle (the r05 first run's 1,740
        # deletes/s was really ~1,930 for exactly this reason)
        log = ex.run([
            {"operation": "delete", "start": lo, "end": lo + step},
            {"operation": "insert", "start": N + lo, "end": N + lo + step},
            {"operation": "search"},
        ])
        _dump(log, build_s, partial=c + 1 < CYCLES)
        last = [e for e in log if e["operation"] == "search"][-1]
        LOG(f"cycle {c}: recall={last.get('recall'):.4f}")

    print(json.dumps(_dump(log, build_s, partial=False)), flush=True)


def _dump(log, build_s, *, partial):
    recalls = [e["recall"] for e in log if e["operation"] == "search"]
    ins = [e for e in log if e["operation"] == "insert"]
    dels = [e for e in log if e["operation"] == "delete"]
    ins_rate = sum(e["count"] for e in ins) / max(
        sum(e["wall_s"] for e in ins), 1e-9)
    del_rate = sum(e["count"] for e in dels) / max(
        sum(e["wall_s"] for e in dels), 1e-9)
    out = {
        "metric": "stream1m_recall_after_50pct_churn",
        "value": recalls[-1] if recalls else 0.0,
        "unit": "recall@10",
        "extra": {
            "n": N, "cycles": CYCLES, "churn_frac": FRAC,
            "delete_method": METHOD, "delete_repair": REPAIR,
            "delete_max_dead": MAX_DEAD,
            "build_s": round(build_s, 1),
            "inserts_per_s": round(ins_rate),
            "deletes_per_s": round(del_rate),
            "recall_trajectory": [round(r, 4) for r in recalls],
            "recall_min": round(min(recalls), 4) if recalls else 0,
            "partial": partial or None,
            "steps": log,
        },
    }
    with open(OUT, "w") as f:
        f.write(json.dumps(out) + "\n")
    return out


if __name__ == "__main__":
    main()
