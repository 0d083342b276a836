"""Benchmark CLI (replaces the `diskann-benchmark` binary).

    python -m diskann_tpu.bench run jobs.json [-o results.json]
    python -m diskann_tpu.bench list
    python -m diskann_tpu.bench check A.json B.json tolerances.json

Jobs are JSON: [{"benchmark": "graph-index", ...}, ...] — see
`diskann_tpu/bench/example/` (reference: `diskann-benchmark/example/*.json`).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="diskann_tpu.bench")
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run")
    r.add_argument("jobs")
    r.add_argument("-o", "--out")
    r.add_argument("--trace", help="export host-side spans as JSON "
                   "(json_spancollector analogue)")

    sub.add_parser("list")

    c = sub.add_parser("check")
    c.add_argument("a")
    c.add_argument("b")
    c.add_argument("tolerances")

    g = sub.add_parser(
        "abgate",
        help="contention-proof interleaved A/B gate (A,B,A,B reps, probe "
        "brackets, auto-requeue; PASS/FAIL/INDECISIVE with no manual "
        "disposition channel)",
    )
    g.add_argument("--n", type=int, default=1_000_000)
    g.add_argument("--nq", type=int, default=8192)
    g.add_argument("--k", type=int, default=10)
    g.add_argument("--a", required=True,
                   help='side A, e.g. "l=40,mh=6,rl=12,mtrunc=0"')
    g.add_argument("--b", required=True, help="side B (same syntax)")
    g.add_argument("--reps", type=int, default=3)
    g.add_argument("--clean-s", type=float, default=3.0)
    g.add_argument("--max-attempts", type=int, default=8)
    g.add_argument("--build-n", type=int, default=0,
                   help="also interleave 2x2 builds at this N (0 = skip)")
    g.add_argument("--attach-dp", type=int, default=128)
    g.add_argument("--idx-cache", default="",
                   help="load the shared index from this GraphIndex.save "
                   "dir instead of building fresh (the headline bench's "
                   "BENCH_SAVE_IDX cache); search-config gates only need "
                   "ONE index, whoever built it")
    g.add_argument("-o", "--out", help="artifact file to write")

    args = ap.parse_args(argv)

    from diskann_tpu.bench.harness import default_registry

    reg = default_registry()

    if args.cmd == "list":
        for name in reg.names():
            print(name)
    elif args.cmd == "run":
        if args.trace:
            from diskann_tpu import trace

            trace.enable(True)
        results = reg.run_file(args.jobs)
        text = json.dumps(results, indent=2)
        if args.out:
            with open(args.out, "w") as f:
                f.write(text)
        print(text)
        if args.trace:
            n = trace.export_spans(args.trace)
            print(f"wrote {n} spans to {args.trace}", file=sys.stderr)
    elif args.cmd == "check":
        from diskann_tpu.bench.registry import check_tolerances

        def load_result(path):
            with open(path) as f:
                d = json.load(f)
            # the round driver wraps bench.py's JSON line in
            # {"cmd": ..., "rc": ..., "parsed": {...}} — unwrap it so one
            # tolerance file gates both raw and driver-captured artifacts
            if isinstance(d, dict) and isinstance(d.get("parsed"), dict):
                return d["parsed"]
            return d

        a = load_result(args.a)
        b = load_result(args.b)
        with open(args.tolerances) as f:
            tol = json.load(f)
        pf = check_tolerances(a, b, tol)
        # self-describing gate output: show each compared metric's values
        # (the committed AB_GATE_* files should be readable on their own)
        def dig(d, dotted):
            cur = d
            for part in dotted.split("."):
                if not isinstance(cur, dict) or part not in cur:
                    return None
                cur = cur[part]
            return cur

        for metric, spec in tol.items():
            va, vb = dig(a, metric), dig(b, metric)
            if va is None or vb is None:
                print(f"  {metric}: missing ({va} -> {vb})")
                continue
            chg = (float(vb) - float(va)) / max(abs(float(va)), 1e-30)
            print(f"  {metric}: {va} -> {vb} ({chg:+.1%})")
        if pf.passed:
            print(f"PASS ({pf.checks} checks)")
        else:
            print("FAIL:")
            for msg in pf.failures:
                print(" ", msg)
            sys.exit(1)
    elif args.cmd == "abgate":
        sys.exit(_abgate(args))


def _abgate(args) -> int:
    """Self-contained interleaved A/B gate over the headline workload:
    build ONE index (the sides share it — search-config gates), then run
    probe-bracketed interleaved search reps and optionally 2x2 interleaved
    builds.  Writes a self-describing artifact with an automated
    PASS/FAIL/INDECISIVE verdict (reference A/B CI + A/A noise policy,
    `.github/docs/disk-benchmarks-aa.md:7-60`)."""
    import os
    import time

    import numpy as np

    from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
    from diskann_tpu.bench.abgate import (
        EXIT, Side, decide, interleaved_build_gate, interleaved_search_gate,
        make_probe, render_artifact,
    )
    from diskann_tpu.bench.harness import make_clustered

    log = lambda s: print(s, file=sys.stderr, flush=True)  # noqa: E731
    n, nq, k = args.n, args.nq, args.k
    d = 128
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cache = os.path.join(repo, ".cache")
    os.makedirs(cache, exist_ok=True)

    x, q = make_clustered(0, n, nq, d, n_clusters=4096, sigma=0.35,
                          device=True)
    gt_cache = f"{cache}/gt_s0_c4096_sig0.35_{n}_{nq}_{d}_{k}.npy"
    if os.path.exists(gt_cache):
        gt = np.load(gt_cache)
    else:
        log("[abgate] computing exact groundtruth")
        _, gt = FlatIndex(x, Metric.L2).search(np.asarray(q), k=k)
        gt = np.asarray(gt)
        np.save(gt_cache, gt)
    qn = np.asarray(q)

    cfg = GraphConfig(max_degree=64, l_build=100, alpha=1.2, beam_width=4,
                      build_max_hops=12, max_occlusion_size=256)
    build_kw = dict(insert_batch_size=8192, search_batch_size=2048,
                    build_mode="packed", packed_dp=64)
    t0 = time.time()
    if args.idx_cache and os.path.isdir(args.idx_cache):
        idx = GraphIndex.load(args.idx_cache, search_batch_size=2048)
        log(f"[abgate] shared index loaded in {time.time()-t0:.1f}s")
    else:
        idx = GraphIndex.build(x, cfg, **build_kw)
        log(f"[abgate] shared index built in {time.time()-t0:.1f}s")
    if args.attach_dp:
        idx.attach_packed(dp=args.attach_dp, writable=False)

    probe = make_probe()
    side_a = Side.parse("A", args.a)
    side_b = Side.parse("B", args.b)
    search_res = interleaved_search_gate(
        idx, qn, gt, k, side_a, side_b, reps=args.reps,
        max_attempts=args.max_attempts, clean_s=args.clean_s, probe=probe,
        log=log,
    )
    build_res = None
    if args.build_n:
        del idx
        xb = x[: args.build_n]
        build_res = interleaved_build_gate(
            xb, cfg, build_kw, build_kw, clean_s=args.clean_s, probe=probe,
            log=log,
        )
    verdict, lines = decide(search_res, build_res)
    header = (
        f"# Interleaved A/B gate (automated; no manual disposition)\n"
        f"# cmd: python -m diskann_tpu.bench abgate --n {n} --nq {nq} "
        f"--a \"{args.a}\" --b \"{args.b}\" --reps {args.reps} "
        f"--clean-s {args.clean_s} --build-n {args.build_n}\n"
        f"# interleaved A,B,A,B reps; every rep probe-bracketed; dirty reps "
        f"re-queued; verdict over probe-clean medians"
    )
    text = render_artifact(header, search_res, build_res, verdict, lines)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    return EXIT[verdict]


if __name__ == "__main__":
    main()
