"""Round-5 headline battery: interleaved config A/B on the cached 1M index.

The chip is time-shared and varies 10-20x between windows (CLAUDE.md), and
the bench's RTT-dominated light probe (~28ms) is blind to moderate
contention — so the ONLY honest cross-config comparison is interleaving:
every round times every config back-to-back, and each config is scored by
(a) its min wall across rounds and (b) its per-round ratio to the r04
scored baseline config measured seconds apart.

Run: PYTHONPATH=/root/repo python scripts/r5_battery.py 2>&1 | tee /tmp/r5_battery.log
Env: BAT_ROUNDS (5), BAT_NQ (8192)
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/xla_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diskann_tpu import GraphIndex  # noqa: E402
from diskann_tpu.bench.harness import make_clustered  # noqa: E402
from diskann_tpu.bench.recall import knn_recall  # noqa: E402

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)

N, D, K = 1_000_000, 128, 10
NQ = int(os.environ.get("BAT_NQ", 8192))
ROUNDS = int(os.environ.get("BAT_ROUNDS", 5))
CACHE = "/root/repo/.cache"
IDX = f"{CACHE}/idx_s0_c4096_sig0.35_{N}_{D}_R64"
GT = f"{CACHE}/gt_s0_c4096_sig0.35_{N}_{NQ}_{D}_{K}.npy"


class WD:
    def __init__(self, s, what):
        self.s, self.what = s, what

    def __enter__(self):
        signal.signal(signal.SIGALRM,
                      lambda *_: (_ for _ in ()).throw(
                          TimeoutError(f"{self.what} > {self.s}s")))
        signal.alarm(self.s)

    def __exit__(self, *e):
        signal.alarm(0)
        return False


# ---- compute-heavy contention probe: ~17 TFLOP of chained bf16 matmul.
# The bench's 8-iter 2048^2 probe is RTT-dominated (28ms) and blind; this
# one runs ~0.15-0.3s clean and scales visibly under time-sharing.
@jax.jit
def _probe_op(a):
    def step(i, x):
        return (x @ x * 1e-4).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, 64, step, a)[:1, :1]


def probe():
    a = jnp.full((4096, 4096), 1e-3, jnp.bfloat16)
    t0 = time.time()
    np.asarray(_probe_op(a))
    return round(time.time() - t0, 3)


# (name, dict of index attrs, dict of search kwargs)
# Battery 2 (battery 1 verdict: mtrunc -4.5%, sbs4096 -14%, L-cuts flat;
# W2mh9 +3% and rs8mh5 +1% — expansions/query is the lever, so push
# entry-point quality + beam/hop cuts).
_A = {"merge_trunc": False, "search_batch_size": 2048, "pack_flat": False}
CONFIGS = [
    # r04 scored point (the normalizer, present in every round)
    ("base_r04", _A, dict(l_search=20, max_hops=6, rerank_l=12,
                          beam_width=4)),
    # int8 query wire: upload bytes are ON the critical path (f32 wire
    # measured -35%, battery3) -- i8 halves the f16 upload again.  Recall
    # cost of the reconstructed q must be measured at THIS shape.
    ("qi8", _A, dict(l_search=20, max_hops=6, rerank_l=12, beam_width=4,
                     query_dtype="i8")),
    ("qi8_L24", _A, dict(l_search=24, max_hops=6, rerank_l=16, beam_width=4,
                         query_dtype="i8")),
    ("qi8_W2mh9", _A, dict(l_search=20, max_hops=9, rerank_l=12,
                           beam_width=2, query_dtype="i8")),
    # battery-2/3 f16 winner, for reference
    ("W2mh9", _A, dict(l_search=20, max_hops=9, rerank_l=12, beam_width=2)),
]


def main():
    LOG(f"[bat] backend={jax.default_backend()} rounds={ROUNDS} nq={NQ}")
    gt = np.load(GT)[:NQ]
    _, q = make_clustered(0, N, NQ, D, n_clusters=4096, sigma=0.35,
                          device=True)
    qn = np.asarray(q)
    with WD(1200, "probe compile"):
        probe()
    LOG(f"[bat] probe (clean-ish ref): {probe()}s")

    with WD(2400, "index load"):
        t0 = time.time()
        idx = GraphIndex.load(IDX, search_batch_size=2048)
        LOG(f"[bat] index loaded in {time.time()-t0:.1f}s")
    with WD(2400, "packed re-attach dp=128"):
        t0 = time.time()
        idx.attach_packed(dp=128, writable=False)
        LOG(f"[bat] re-attach in {time.time()-t0:.1f}s")

    def run_cfg(attrs, kw):
        for a, v in attrs.items():
            setattr(idx, a, v)
        kw = dict(kw)
        kw.setdefault("query_dtype", np.float16)
        return idx.search(qn, K, mode="packed", **kw)

    # ---- compile + recall pass (one per config) ----
    results = {}
    for name, attrs, kw in CONFIGS:
        try:
            with WD(1800, f"compile {name}"):
                t0 = time.time()
                _, ids, stats = run_cfg(attrs, kw)
                dt = time.time() - t0
            r = knn_recall(ids, gt, K)
            results[name] = {"recall": round(float(r), 4),
                             "hops": float(stats.hops.mean()),
                             "walls": [], "probes": []}
            LOG(f"[bat] {name}: compiled+first in {dt:.1f}s "
                f"recall={r:.4f} hops={stats.hops.mean():.1f}")
        except Exception as e:
            LOG(f"[bat] {name}: FAILED {type(e).__name__}: {e}")
            results[name] = {"error": str(e), "walls": [], "probes": []}

    live = [(n, a, k) for n, a, k in CONFIGS if "error" not in results[n]]

    # ---- interleaved timing rounds ----
    for rnd in range(ROUNDS):
        p0 = probe()
        LOG(f"[bat] round {rnd}: probe={p0}s")
        for name, attrs, kw in live:
            try:
                with WD(600, f"round {rnd} {name}"):
                    t0 = time.time()
                    run_cfg(attrs, kw)
                    w = time.time() - t0
                results[name]["walls"].append(round(w, 4))
                results[name]["probes"].append(p0)
            except Exception as e:
                LOG(f"[bat] round {rnd} {name}: {e}")
        line = " ".join(
            f"{n}={NQ/results[n]['walls'][-1]:.0f}" for n, _, _ in live
            if results[n]["walls"])
        LOG(f"[bat] round {rnd}: {line}")

    # ---- score: min wall + median ratio vs base_r04 within each round ----
    base_walls = results["base_r04"]["walls"]
    report = []
    for name, attrs, kw in live:
        w = results[name]["walls"]
        if not w:
            continue
        ratios = [b / x for x, b in zip(w, base_walls)]
        report.append({
            "name": name, "recall": results[name]["recall"],
            "hops": results[name]["hops"],
            "qps_min_wall": round(NQ / min(w)),
            "qps_med": round(NQ / sorted(w)[len(w) // 2]),
            "speedup_vs_base_med": round(sorted(ratios)[len(ratios) // 2], 4),
            "walls": w,
        })
        LOG(f"[bat] FINAL {name}: recall={results[name]['recall']} "
            f"qps_min={report[-1]['qps_min_wall']} "
            f"x_base={report[-1]['speedup_vs_base_med']}")
    out = {"rounds": ROUNDS, "nq": NQ, "report": report,
           "probe_final": probe()}
    with open("/tmp/r5_battery.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
