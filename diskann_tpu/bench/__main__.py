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


if __name__ == "__main__":
    main()
