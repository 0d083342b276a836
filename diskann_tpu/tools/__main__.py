"""CLI data tools.

Commands (reference binaries in `diskann-tools/src/bin/`):
  compute-groundtruth   exact kNN ids+dists (compute_groundtruth.rs)
  compute-range-gt      ids within a radius (compute_range_groundtruth.rs)
  random-data           synthetic vectors (random_data_generator.rs)
  synthetic-labels      zipf-ish labels JSONL (generate_synthetic_labels.rs)
  subsample             random row subset (subsample.rs)
  generate-pq           train + save a PQ codebook (generate_pq.rs)
  generate-minmax       encode with MinMax (generate_minmax.rs)
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="diskann_tpu.tools")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("compute-groundtruth")
    g.add_argument("data")
    g.add_argument("queries")
    g.add_argument("-o", "--out", required=True)
    g.add_argument("-k", type=int, default=100)
    g.add_argument("--metric", default="l2")

    r = sub.add_parser("compute-range-gt")
    r.add_argument("data")
    r.add_argument("queries")
    r.add_argument("-o", "--out", required=True)
    r.add_argument("--radius", type=float, required=True)
    r.add_argument("--metric", default="l2")

    d = sub.add_parser("random-data")
    d.add_argument("-o", "--out", required=True)
    d.add_argument("-n", type=int, required=True)
    d.add_argument("--dim", type=int, required=True)
    d.add_argument("--clusters", type=int, default=0)
    d.add_argument("--sigma", type=float, default=0.3)
    d.add_argument("--seed", type=int, default=0)

    l = sub.add_parser("synthetic-labels")
    l.add_argument("-o", "--out", required=True)
    l.add_argument("-n", type=int, required=True)
    l.add_argument("--n-labels", type=int, default=10)
    l.add_argument("--zipf", type=float, default=1.2)
    l.add_argument("--seed", type=int, default=0)

    s = sub.add_parser("subsample")
    s.add_argument("data")
    s.add_argument("-o", "--out", required=True)
    s.add_argument("-n", type=int, required=True)
    s.add_argument("--seed", type=int, default=0)

    p = sub.add_parser("generate-pq")
    p.add_argument("data")
    p.add_argument("-o", "--out", required=True)
    p.add_argument("--chunks", type=int, default=32)
    p.add_argument("--centers", type=int, default=256)

    m = sub.add_parser("generate-minmax")
    m.add_argument("data")
    m.add_argument("-o", "--out", required=True)

    args = ap.parse_args(argv)

    from diskann_tpu.io_.fbin import read_fbin, write_fbin

    if args.cmd == "compute-groundtruth":
        from diskann_tpu.flat import FlatIndex
        from diskann_tpu.ops.distance import Metric

        data = read_fbin(args.data)
        queries = read_fbin(args.queries)
        dist, ids = FlatIndex(data, Metric(args.metric)).search(queries, k=args.k)
        write_fbin(args.out, ids.astype(np.int32))
        write_fbin(args.out + ".dists", dist.astype(np.float32))
        print(f"wrote {ids.shape} groundtruth to {args.out}")

    elif args.cmd == "compute-range-gt":
        from diskann_tpu.flat import FlatIndex
        from diskann_tpu.ops.distance import Metric

        data = read_fbin(args.data)
        queries = read_fbin(args.queries)
        flat = FlatIndex(data, Metric(args.metric))
        out = []
        k = 128
        while True:
            dist, ids = flat.search(queries, k=min(k, len(data)))
            if (dist[:, -1] > args.radius).all() or k >= len(data):
                break
            k *= 2
        for row_d, row_i in zip(dist, ids):
            out.append(row_i[(row_i >= 0) & (row_d <= args.radius)].tolist())
        with open(args.out, "w") as f:
            json.dump(out, f)
        print(f"wrote range groundtruth for {len(out)} queries to {args.out}")

    elif args.cmd == "random-data":
        rng = np.random.default_rng(args.seed)
        if args.clusters > 0:
            centers = rng.standard_normal((args.clusters, args.dim))
            a = rng.integers(0, args.clusters, size=args.n)
            x = centers[a] + args.sigma * rng.standard_normal((args.n, args.dim))
        else:
            x = rng.standard_normal((args.n, args.dim))
        write_fbin(args.out, x.astype(np.float32))
        print(f"wrote {args.n}x{args.dim} to {args.out}")

    elif args.cmd == "synthetic-labels":
        rng = np.random.default_rng(args.seed)
        weights = 1.0 / np.arange(1, args.n_labels + 1) ** args.zipf
        weights /= weights.sum()
        with open(args.out, "w") as f:
            for _ in range(args.n):
                count = 1 + rng.poisson(1)
                labs = rng.choice(args.n_labels, size=min(count, args.n_labels),
                                  replace=False, p=weights)
                f.write(json.dumps({"labels": [f"label_{i}" for i in labs]}) + "\n")
        print(f"wrote {args.n} label rows to {args.out}")

    elif args.cmd == "subsample":
        rng = np.random.default_rng(args.seed)
        data = read_fbin(args.data, mmap=True)
        sel = np.sort(rng.choice(len(data), size=args.n, replace=False))
        write_fbin(args.out, np.asarray(data[sel]))
        print(f"wrote {args.n} rows to {args.out}")

    elif args.cmd == "generate-pq":
        import jax
        from diskann_tpu.io_.record import save_record
        from diskann_tpu.quant.pq import train_pq

        data = read_fbin(args.data)
        pq = train_pq(jax.random.key(0), data, n_chunks=args.chunks,
                      n_centers=args.centers)
        codes = pq.encode(data)
        save_record(args.out, "pq", {"dim": pq.dim},
                    {"pivots": np.asarray(pq.pivots), "codes": np.asarray(codes)})
        print(f"wrote PQ ({args.chunks}x{args.centers}) to {args.out}")

    elif args.cmd == "generate-minmax":
        from diskann_tpu.io_.record import save_record
        from diskann_tpu.quant.minmax import MinMaxQuantizer

        data = read_fbin(args.data)
        mm = MinMaxQuantizer()
        codes, lo, step = mm.encode(data)
        save_record(args.out, "minmax", {},
                    {"codes": np.asarray(codes), "lo": np.asarray(lo),
                     "step": np.asarray(step)})
        print(f"wrote minmax codes to {args.out}")


if __name__ == "__main__":
    main()
