"""Headline benchmark: build + search a 1M x 128 index on one TPU chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N/100000}
(100k QPS @ recall@10 >= 0.95 on SIFT-1M-scale data is the BASELINE.md
target for a single v5e chip.)

Progress/diagnostics go to stderr.  Dataset is synthetic clustered
(SIFT-scale: 1M x 128 f32) generated on-device; groundtruth is computed
exactly with the flat index on-chip.

Env knobs: BENCH_N (default 1_000_000), BENCH_NQ (8192), BENCH_MODE
("packed"), BENCH_SKIP_BUILD=1 to reuse a cached index directory.
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)


# best successful sweep point so far, for the watchdog's last-resort report
_LAST_GOOD: dict = {}


def _emit_last_resort(what: str):
    if _LAST_GOOD:
        print(json.dumps(_LAST_GOOD), flush=True)
    else:
        print(json.dumps({
            "metric": "qps_at_recall0.95_1M_128d_packed",
            "value": 0, "unit": "qps", "vs_baseline": 0,
            "extra": {"error": f"watchdog: {what}"},
        }), flush=True)


class _Watchdog:
    """Timeout guard around relay-bound steps: the shared-TPU relay has
    been observed to wedge indefinitely (a blocked RPC never returns).

    Two layers, because a Python SIGALRM handler only runs when the main
    thread executes bytecode — a wedge INSIDE the C++ relay client never
    lets it fire:
    - SIGALRM raises TimeoutError when the main thread is interruptible
      (lets the caller degrade gracefully, e.g. report a partial sweep);
    - a daemon Timer thread at 1.5x the budget prints the best JSON line
      seen so far (or an error line) and hard-exits — the guarantee that
      the driver always records SOMETHING."""

    def __init__(self, seconds, what):
        self.seconds, self.what = seconds, what

    def __enter__(self):
        import threading

        def _raise(*_):
            raise TimeoutError(f"{self.what} exceeded {self.seconds}s")

        signal.signal(signal.SIGALRM, _raise)
        signal.alarm(self.seconds)

        def _hard_exit():
            LOG(f"[bench] HARD watchdog: {self.what} wedged; emitting "
                "last-resort JSON and exiting")
            _emit_last_resort(f"{self.what} wedged (relay blocked in C)")
            os._exit(3)

        self._timer = threading.Timer(self.seconds * 1.5, _hard_exit)
        self._timer.daemon = True
        self._timer.start()

    def __exit__(self, *exc):
        signal.alarm(0)
        self._timer.cancel()
        return False


def main():
    import numpy as np
    import jax

    # persistent compile cache: repeat bench runs (and L-sweep variants)
    # skip the expensive remote TPU compilation
    # repo-local default (gitignored): /tmp is wiped with the VM, and a cold
    # driver run then pays every remote TPU compile again
    _repo_cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".cache"
    )
    cache_dir = os.environ.get(
        "JAX_CACHE_DIR", os.path.join(_repo_cache, "xla_bench")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        LOG(f"[bench] no persistent compile cache: {e}")

    n = int(os.environ.get("BENCH_N", 1_000_000))
    nq = int(os.environ.get("BENCH_NQ", 8192))
    mode = os.environ.get("BENCH_MODE", "packed")
    r_deg = int(os.environ.get("BENCH_R", 64))
    w = int(os.environ.get("BENCH_W", 4))
    sw = int(os.environ.get("BENCH_SW", 0)) or w  # search beam width
    # sub-batch pipelining: dispatch-then-fetch over 2048-query sub-batches
    # overlaps each sub-batch's host->device query upload with the previous
    # one's compute (uploads run ~54MB/s on the relay and would otherwise
    # cost more than the whole search loop; /tmp/r2_qps4.log)
    sbs = int(os.environ.get("BENCH_SBS", 2048))
    d = 128
    k = 10
    target_recall = 0.95

    from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
    from diskann_tpu.bench.harness import make_clustered
    from diskann_tpu.bench.recall import knn_recall

    LOG(f"[bench] generating clustered data n={n} d={d} nq={nq} (on device)")
    t0 = time.time()
    with _Watchdog(2400, "data generation"):
        x, q = make_clustered(
            0, n, nq, d, n_clusters=4096, sigma=0.35, device=True
        )
    LOG(f"[bench] data ready in {time.time()-t0:.1f}s")

    # Cache key includes every data-generation parameter so changing the
    # distribution never silently reuses a stale groundtruth file.
    os.makedirs(_repo_cache, exist_ok=True)
    gt_cache = os.environ.get(
        "BENCH_GT_CACHE",
        f"{_repo_cache}/gt_s0_c4096_sig0.35_{n}_{nq}_{d}_{k}.npy",
    )
    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)
        LOG(f"[bench] groundtruth loaded from {gt_cache}")
    else:
        LOG("[bench] computing exact groundtruth (flat scan)")
        t0 = time.time()
        with _Watchdog(2400, "groundtruth scan"):
            flat = FlatIndex(x, Metric.L2)
            _, gt = flat.search(np.asarray(q), k=k)
            gt = np.asarray(gt)
        LOG(f"[bench] groundtruth in {time.time()-t0:.1f}s")
        np.save(gt_cache, gt)
        del flat

    # ---- filtered-workload fixtures (YFCC-row analogue): a zipf-ish
    # categorical label per point; filtered GT = exact scan over members.
    # Label assignment is SEEDED so cached GT files stay valid.
    filt_preds = ()
    if os.environ.get("BENCH_FILTERED", "1") == "1":
        filt_preds = ("cat0", "cat7", "cat0 | cat1")
        lrng = np.random.default_rng(0xF117)
        weights = 1.0 / np.arange(1, 33) ** 0.8
        weights /= weights.sum()
        cats = lrng.choice(32, size=n, p=weights)
        filt_gt = {}
        fkey = lambda p: p.replace(" ", "").replace("|", "OR")  # noqa: E731
        need = [
            p for p in filt_preds
            if not os.path.exists(gt_cache + f".f{fkey(p)}.npy")
        ]
        if need and x is None:
            x = make_clustered(0, n, nq, d, n_clusters=4096, sigma=0.35,
                               device=True)[0]
        for p in filt_preds:
            fcache = gt_cache + f".f{fkey(p)}.npy"
            if os.path.exists(fcache):
                filt_gt[p] = np.load(fcache)
                continue
            if p == "cat0":
                m = cats == 0
            elif p == "cat7":
                m = cats == 7
            else:
                m = (cats == 0) | (cats == 1)
            members = np.nonzero(m)[0]
            LOG(f"[bench] filtered GT for {p!r} over {len(members)} members")
            with _Watchdog(2400, f"filtered GT {p}"):
                import jax.numpy as jnp

                sub = FlatIndex(x[jnp.asarray(members)], Metric.L2)
                _, gl = sub.search(np.asarray(q), k=k)
                filt_gt[p] = members[np.asarray(gl)]
                del sub
            np.save(fcache, filt_gt[p])
    # keep the dataset device-resident through the build: insert() slices
    # batches on device, so the 512MB array never crosses the ~54MB/s relay
    # (a host round trip costs ~20s of pure transfer).  occ=256 build
    # transients leave ample HBM for the extra 520MB.
    if os.environ.get("BENCH_SKIP_BUILD") == "1":
        x = None
    q = np.asarray(q)

    # build knobs, both measured recall-neutral on the 1M bench while cutting
    # insert_batch 1783 -> 1285 ms (/tmp/r2_insert*.log, /tmp/r2_occ_build.log:
    # L-sweep recall identical to 4 decimal places vs occ=750/uncapped):
    # - build_max_hops=24: cap candidate-search hops (mean converges ~93)
    # - max_occlusion_size=256: the prune's [M, C, 128] pool gather is
    #   row-issue-bound, cost linear in C; 750 is a worst-case cap
    # with router-seeded build searches (insert() refreshes a 32k router
    # table every 16 batches) candidate generation converges by ~10 hops;
    # 12 is recall-identical to 24/uncapped (/tmp/r2_bench9.log vs bench8)
    bmh = int(os.environ.get("BENCH_BUILD_MAXHOPS", 12)) or None
    occ = int(os.environ.get("BENCH_OCC", 256))
    cfg = GraphConfig(max_degree=r_deg, l_build=100, alpha=1.2, beam_width=w,
                      build_max_hops=bmh, max_occlusion_size=occ)

    # ---- A/A noise floor (reference daily A/A runs,
    # .github/docs/disk-benchmarks-aa.md): a KNOWN-CONSTANT probe op timed
    # around each measured section.  The chip is time-shared and varies
    # 10-20x under contention, so neither the build rate nor a QPS delta is
    # decidable without this figure in the artifact.
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _probe_op(a):
        def body(_, s):
            return jnp.tanh(s @ a)
        return jax.lax.fori_loop(0, 8, body, a)[:1, :1]

    def _probe():
        a = jnp.full((2048, 2048), 0.01, jnp.bfloat16)
        t0 = time.time()
        np.asarray(_probe_op(a))
        return round(time.time() - t0, 3)

    with _Watchdog(1200, "contention probe (pre-build)"):
        _probe()                      # compile
        probe_s_build = _probe()
    LOG(f"[bench] contention probe before build: {probe_s_build}s "
        f"(clean chip ~1s)")
    # cache key includes every data-generation parameter (like the GT cache):
    # a stale index built from a different distribution reports garbage recall
    idx_cache = os.environ.get(
        "BENCH_IDX_CACHE",
        f"{_repo_cache}/idx_s0_c4096_sig0.35_{n}_{d}_R{r_deg}",
    )
    build_s = None
    if os.environ.get("BENCH_SKIP_BUILD") == "1" and os.path.isdir(idx_cache):
        LOG(f"[bench] loading cached index from {idx_cache}")
        t0 = time.time()
        idx = GraphIndex.load(idx_cache, search_batch_size=sbs)
        LOG(f"[bench] index loaded in {time.time()-t0:.1f}s")
    else:
        LOG(f"[bench] building index R={cfg.max_degree} L={cfg.l_build} W={w} "
            f"sbs={sbs} (packed)")
        if x is None:  # SKIP_BUILD requested but no cache present
            x = make_clustered(0, n, nq, d, n_clusters=4096, sigma=0.35,
                               device=True)[0]
        t0 = time.time()
        with _Watchdog(7200, "index build"):
            idx = GraphIndex.build(
                x, cfg, insert_batch_size=8192, search_batch_size=sbs,
                build_mode="packed", packed_dp=64,
                build_backedge_src_cap=int(os.environ.get("BENCH_BSC", 64)),
            )
        build_s = time.time() - t0
        x = None  # free the 520MB device copy before the search sweep
        pts_per_s = n / build_s
        LOG(f"[bench] build: {build_s:.1f}s ({pts_per_s:.0f} pts/s)")
        if os.environ.get("BENCH_SAVE_IDX") == "1":
            t0 = time.time()
            idx.save(idx_cache)
            LOG(f"[bench] index saved to {idx_cache} "
                f"({time.time()-t0:.1f}s)")

    # Read-only full-dim packed re-attach (round-3 headline default):
    # dp=128 int8 codes make the traversal ordering near-exact — recall
    # 0.9987 at L=40 vs 0.9536 at L=90 with dp=64 on the same graph
    # (/tmp/r3_sweep3d.log) — so the whole operating point shifts to tiny
    # L, a tiny rerank budget, and a 6-hop cap.  BENCH_ATTACH_DP=0 reverts.
    attach_dp = int(os.environ.get("BENCH_ATTACH_DP", 128))
    if attach_dp:
        LOG(f"[bench] re-attaching packed layout at dp={attach_dp}")
        t0 = time.time()
        with _Watchdog(2400, "packed re-attach"):
            idx.attach_packed(dp=attach_dp, writable=False)
        LOG(f"[bench] re-attach in {time.time()-t0:.1f}s")

    qn = np.asarray(q)
    rerank_l = int(os.environ.get("BENCH_RERANK", 12 if attach_dp else 0)) \
        or None
    # Query wire formats to sweep (BENCH_QDTS, comma list; BENCH_QDT
    # forces one).  f16 halves the f32 upload (recall delta -0.0006);
    # "i8" (per-row SQ + in-band scale, `_encode_i8pack`) halves it again —
    # the upload is ON the critical path (f32 wire measured -35% QPS,
    # /tmp/r5_battery3.log), but the reconstructed q costs some recall, so
    # the sweep SCORES both and the best >=0.95-recall point wins.
    _one = os.environ.get("BENCH_QDT")
    qdts = ([_one] if _one else
            os.environ.get("BENCH_QDTS",
                           "float16,i8" if attach_dp else "float16")
            .split(","))

    def _resolve_qdt(name):
        if name in ("", "float32", "f32"):
            return None
        if name in ("i8", "int8", "i8pack"):
            return "i8"
        return np.dtype(name)
    # hop cap: measured on the 1M bench index, recall saturates by ~10 hops
    # at W=4 with router starts (free-running converges at ~91 hops for
    # +0.0005 recall; mh=10/9/8 all hold recall@L=90 >= 0.9527,
    # /tmp/r2_qps6.log; mh=9 beat mh=10 by ~10% QPS at identical recall in
    # two same-process sweeps, /tmp/r2c_qps1.json /tmp/r2d_qps1.json).
    # Each capped hop saves expansion DMA + sorts + the ~0.5ms iteration
    # floor.  With dp=128 codes (near-exact walk) recall saturates by ~6
    # hops even at L=24 (0.9926, /tmp/r3_sweep4.log); the dp=64 layout
    # needs ~9.  BENCH_MAXHOPS=-1 disables.
    max_hops = int(os.environ.get("BENCH_MAXHOPS", 6 if attach_dp else 9))
    max_hops = None if max_hops <= 0 else max_hops
    # BENCH_RS: per-query router entry points (0 = config default 4).  More
    # starts seed a better initial list so the walk needs fewer hops.
    rstarts = int(os.environ.get("BENCH_RS", 0)) or None
    # BENCH_UNROLL: statically unroll the composed hop loop — removes the
    # ~0.5ms/iteration lax-loop floor (~3ms/dispatch at mh=6) at the cost
    # of a longer compile.  BENCH_RCOMP=bf16: router distances in bf16
    # (halves the [B, S] HBM materialization; entry selection only).
    # Both default ON since round 4: A/B'd recall-neutral (BASELINE.md
    # round-3 row) — the scored config is the best-known operating point.
    idx.unroll_hops = os.environ.get("BENCH_UNROLL", "1") == "1"
    idx.router_compute = os.environ.get("BENCH_RCOMP", "bf16")
    # BENCH_MTRUNC: pre-top_k hop candidates to L before the merge sort.
    # Default OFF: the round-5 interleaved battery measured it 4.5% slower
    # at this operating point (/tmp/r5_battery.json).
    idx.merge_trunc = os.environ.get("BENCH_MTRUNC", "0") == "1"
    l_sweep = tuple(
        int(v) for v in os.environ.get(
            "BENCH_LS",
            "16,20,24,30,40" if attach_dp else "90,100,120,140,160,200",
        ).split(",")
    )
    # probe spread just before the sweep (see the pre-build probe above)
    with _Watchdog(1200, "contention probe"):
        probe_s = [_probe() for _ in range(3)]
    LOG(f"[bench] contention probe (fixed op, 3 reps): {probe_s}s")

    best = None
    sweep = []
    # the shared chip varies 3-10x between runs; repeat each point and keep
    # the fastest timing (recall is deterministic) so one contended window
    # doesn't misreport the whole sweep
    reps = int(os.environ.get("BENCH_REPS", 2))
    # probe-gated sweep points: a point whose bracketing probe is dirty
    # (chip time-shared during the reps) re-queues up to BENCH_POINT_RETRY
    # times — one contended window must not misreport a sweep point 1.9x
    # off its neighbors (round-4 artifact showed exactly that)
    point_retries = int(os.environ.get("BENCH_POINT_RETRY", 2))
    probe_clean_s = float(os.environ.get("BENCH_PROBE_CLEAN", 3.0))
    # sweep points: the L grid at the scored defaults, then (BENCH_EXTRA=0
    # disables) the round-5 interleaved-battery winners — narrower beam with
    # a deeper hop cap, and extra router entry points with a shallower one —
    # each measured +2-6% vs the scored base at >=0.95 recall seconds apart
    # on the same index (/tmp/r5_battery*.json: W2mh9 x1.03, rs16mh4 x1.06).
    # All recalls are re-measured here, not trusted from the battery.
    points = [dict(l=l, qdt=qn_, sw=sw, mh=max_hops, rs=rstarts, grid=True)
              for qn_ in qdts for l in l_sweep]
    if attach_dp and os.environ.get("BENCH_EXTRA", "1") == "1":
        for qn_ in qdts:
            points += [
                dict(l=20, qdt=qn_, sw=2, mh=9, rs=rstarts, grid=False),
                dict(l=20, qdt=qn_, sw=sw, mh=4, rs=16, grid=False),
                dict(l=24, qdt=qn_, sw=sw, mh=5, rs=16, grid=False),
            ]
    skip_qdt = set()   # qdt names whose grid already hit recall >= 0.999
    wedged = False
    for pt in points:
        if wedged or (pt["grid"] and pt["qdt"] in skip_qdt):
            continue
        qdt_name, l = pt["qdt"], pt["l"]
        query_dtype = _resolve_qdt(qdt_name)
        p_sw, p_mh, p_rs = pt["sw"], pt["mh"], pt["rs"]
        cname = f"L={l},q={qdt_name}"
        if not pt["grid"]:
            cname += f",W={p_sw},mh={p_mh},rs={p_rs or 'dflt'}"
        try:
            with _Watchdog(1500, f"search sweep point {cname}"):
                idx.search(qn, k, l_search=l, mode=mode, beam_width=p_sw,
                           rerank_l=rerank_l,
                           query_dtype=query_dtype, router_starts=p_rs,
                           max_hops=p_mh)  # compile at full batch shape
                rep_dts, point_probes = [], []
                for attempt in range(point_retries + 1):
                    for _ in range(max(reps, 1)):
                        t0 = time.time()
                        _, ids, stats = idx.search(qn, k, l_search=l,
                                                   mode=mode,
                                                   beam_width=p_sw,
                                                   rerank_l=rerank_l,
                                                   max_hops=p_mh,
                                                   query_dtype=query_dtype,
                                                   router_starts=p_rs)
                        rep_dts.append(time.time() - t0)
                    point_probes.append(_probe())
                    if point_probes[-1] <= probe_clean_s:
                        break
                    LOG(f"[bench] {cname}: probe {point_probes[-1]}s dirty; "
                        f"re-queueing point (attempt {attempt + 1})")
                dt = min(rep_dts)
        except TimeoutError as te:
            # wedged relay: report what the sweep has so far rather than
            # hanging the round's bench artifact
            LOG(f"[bench] {te}; reporting partial sweep")
            wedged = True
            continue
        r = knn_recall(ids, gt, k)
        qps = nq / dt
        sweep.append({"l": l, "qdt": qdt_name, "recall": round(r, 4),
                      "qps": round(qps), "config": cname,
                      "rep_spread": [round(nq / t) for t in rep_dts],
                      "probe_s": point_probes})
        LOG(f"[bench] {cname}: recall@{k}={r:.4f} qps={qps:.0f} "
            f"hops={stats.hops.mean():.0f} probes={point_probes}")
        if r >= target_recall and (best is None or qps > best[1]):
            best = (cname, qps, r)
            _LAST_GOOD.clear()
            _LAST_GOOD.update({
                "metric": f"qps_at_recall{target_recall}_1M_128d_{mode}",
                "value": round(float(qps), 1),
                "unit": "qps",
                "vs_baseline": round(float(qps) / 100_000.0, 4),
                "extra": {"recall": r, "config": cname,
                          "partial": "watchdog_last_good", "n": n},
            })
        if pt["grid"] and r >= 0.999:
            skip_qdt.add(qdt_name)   # larger L is pure cost past this

    # ---- filtered family (YFCC row analogue): packed traversal + inline
    # beta filter + rerank, one composed dispatch per sub-batch ----
    query_dtype = np.float16   # the filtered paths' production wire
    filt_rows = []
    if filt_preds:
        idx.attach_labels([[f"cat{c}"] for c in cats])
        lf = int(os.environ.get("BENCH_FILTERED_L", 90))
        # filtered walks pass through non-matching regions, so they need a
        # higher hop budget than the plain search's saturation cap
        fmh = int(os.environ.get("BENCH_FILTERED_MH", 16))
        # measure the PRODUCTION routing (default scan_threshold): broad
        # predicates take the inline-beta packed walk; mid-selectivity ones
        # (<= ~64k members) route to the exact posting-list scan — the
        # reference evaluates selective predicates straight off Roaring
        # posting lists too (query_evaluator_impl.rs).  The executed path
        # is recorded per row (hops==0 <=> scan).
        for p in filt_preds:
            try:
                with _Watchdog(1500, f"filtered sweep {p}"):
                    idx.search_filtered(
                        qn, p, k, l_search=lf, mode="packed",
                        query_dtype=query_dtype, max_hops=fmh,
                    )  # compile
                    t0 = time.time()
                    _, fids, fstats = idx.search_filtered(
                        qn, p, k, l_search=lf, mode="packed",
                        query_dtype=query_dtype, max_hops=fmh,
                    )
                    fdt = time.time() - t0
            except Exception as fe:
                LOG(f"[bench] filtered {p!r} failed: {fe}")
                continue
            fr = knn_recall(fids, filt_gt[p], k)
            fpath = "scan" if int(fstats.hops.max()) == 0 else "walk"
            row = {"predicate": p, "recall": round(fr, 4),
                   "qps": round(nq / fdt), "path": fpath}
            filt_rows.append(row)
            LOG(f"[bench] filtered {p!r}: recall@{k}={fr:.4f} "
                f"qps={nq/fdt:.0f} path={fpath}")

    if not sweep:
        raise TimeoutError("no sweep point completed (wedged relay?)")
    if best is None:
        # report the highest-recall point (still useful signal)
        top = max(sweep, key=lambda s: s["recall"])
        value, note = top["qps"], f"recall_only_{top['recall']}"
        recall = top["recall"]
    else:
        value, recall = best[1], best[2]
        note = best[0]

    out = {
        "metric": f"qps_at_recall{target_recall}_1M_128d_{mode}",
        "value": round(float(value), 1),
        "unit": "qps",
        "vs_baseline": round(float(value) / 100_000.0, 4),
        "extra": {
            "recall": recall,
            "config": note,
            "build_s": round(build_s, 1) if build_s else None,
            "build_points_per_s": round(n / build_s) if build_s else None,
            "n": n,
            "sweep": sweep,
            "filtered": filt_rows,
            # A/A noise figures: fixed-op probe times (3 reps) measured
            # just before the sweep + the probe rerun after it.  A clean
            # chip runs the probe in ~1s; >3s means the sweep's QPS
            # numbers carry contention noise.
            "noise": {"probe_s_before_build": probe_s_build,
                      "probe_s_before": probe_s,
                      "probe_s_after": _probe()},
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # degrade rather than report nothing
        LOG(f"[bench] FAILED at full scale: {type(e).__name__}: {e}")
        err = f"{type(e).__name__}: {e}"
        # drop the exception's traceback BEFORE retrying: its frames pin
        # the failed run's device buffers (the 1M index!) in HBM
        del e
        import gc

        gc.collect()
        if os.environ.get("BENCH_RETRY") != "0":
            os.environ["BENCH_N"] = str(
                max(int(os.environ.get("BENCH_N", 1_000_000)) // 4, 100_000)
            )
            os.environ["BENCH_RETRY"] = "0"
            LOG(f"[bench] retrying at n={os.environ['BENCH_N']}")
            try:
                main()
            except Exception as e2:
                err = f"{err}; retry: {type(e2).__name__}: {e2}"
                print(json.dumps({
                    "metric": "qps_at_recall0.95_1M_128d_packed",
                    "value": 0, "unit": "qps", "vs_baseline": 0,
                    "extra": {"error": err},
                }), flush=True)
                raise
        else:
            print(json.dumps({
                "metric": "qps_at_recall0.95_1M_128d_packed",
                "value": 0, "unit": "qps", "vs_baseline": 0,
                "extra": {"error": err},
            }), flush=True)
            raise
