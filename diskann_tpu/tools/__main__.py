"""CLI data tools.

Commands (reference binaries in `diskann-tools/src/bin/`):
  compute-groundtruth   exact kNN ids+dists (compute_groundtruth.rs)
  compute-range-gt      ids within a radius (compute_range_groundtruth.rs)
  random-data           synthetic vectors (random_data_generator.rs)
  synthetic-labels      zipf-ish labels JSONL (generate_synthetic_labels.rs)
  subsample             random row subset (subsample.rs)
  generate-pq           train + save a PQ codebook (generate_pq.rs)
  generate-minmax       encode with MinMax (generate_minmax.rs)
  compute-multivec-gt   Chamfer/MaxSim groundtruth over token-set docs
                        (compute_multivec_groundtruth.rs)
  compute-streaming-gt  groundtruth over the live set at each runbook
                        search step (compute_streaming_groundtruth.rs)
  compute-specificities fraction of points matching each label
                        (compute_specificities.rs)
  relative-contrast     dataset hardness: mean(dist)/mean(NN dist)
                        (relative_contrast.rs)
  gen-associated-data   synthetic per-point attribute values keyed off
                        range-gt membership (gen_associated_data_from_range.rs)
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

    mv = sub.add_parser("compute-multivec-gt")
    mv.add_argument("docs", help=".npz with arrays doc_<i> (tokens x dim)")
    mv.add_argument("queries", help=".npz with arrays q_<i>")
    mv.add_argument("-o", "--out", required=True)
    mv.add_argument("-k", type=int, default=10)
    mv.add_argument("--metric", default="maxsim", choices=["maxsim", "chamfer"])

    sg = sub.add_parser("compute-streaming-gt")
    sg.add_argument("data")
    sg.add_argument("queries")
    sg.add_argument("runbook", help="YAML runbook (BigANN style)")
    sg.add_argument("-o", "--out", required=True)
    sg.add_argument("-k", type=int, default=10)
    sg.add_argument("--metric", default="l2")

    sp = sub.add_parser("compute-specificities")
    sp.add_argument("labels", help="JSONL with {'labels': [...]} per point")
    sp.add_argument("-o", "--out", required=True)

    rc = sub.add_parser("relative-contrast")
    rc.add_argument("data")
    rc.add_argument("--sample", type=int, default=1000)
    rc.add_argument("--metric", default="l2")
    rc.add_argument("--seed", type=int, default=0)

    ad = sub.add_parser("gen-associated-data")
    ad.add_argument("range_gt", help="JSON list of id lists (compute-range-gt)")
    ad.add_argument("-o", "--out", required=True)
    ad.add_argument("-n", type=int, required=True, help="total points")
    ad.add_argument("--seed", type=int, default=0)

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

    elif args.cmd == "compute-multivec-gt":
        from diskann_tpu.ops.multivec import FlatMultiVectorIndex

        dz = np.load(args.docs)
        qz = np.load(args.queries)
        docs = [dz[f] for f in sorted(dz.files, key=lambda s: int(s.split("_")[-1]))]
        queries = [qz[f] for f in sorted(qz.files, key=lambda s: int(s.split("_")[-1]))]
        idx = FlatMultiVectorIndex(docs, metric=args.metric)
        dist, ids = idx.search(queries, k=args.k)
        write_fbin(args.out, np.asarray(ids).astype(np.int32))
        write_fbin(args.out + ".dists", np.asarray(dist).astype(np.float32))
        print(f"wrote multi-vector groundtruth {np.asarray(ids).shape} "
              f"to {args.out}")

    elif args.cmd == "compute-streaming-gt":
        from diskann_tpu.bench.runbook import parse_runbook
        from diskann_tpu.flat import FlatIndex
        from diskann_tpu.ops.distance import Metric

        data = read_fbin(args.data)
        queries = read_fbin(args.queries)
        steps = parse_runbook(open(args.runbook).read())
        live: set = set()
        out = []
        for si, step in enumerate(steps):
            op = step.get("operation", step.get("op"))
            if op == "insert":
                live.update(range(int(step["start"]), int(step["end"])))
            elif op == "delete":
                live.difference_update(
                    range(int(step["start"]), int(step["end"]))
                )
            elif op == "replace":
                live.difference_update(
                    range(int(step["ids_start"]), int(step["ids_end"]))
                )
                live.update(range(int(step["tags_start"]), int(step["tags_end"])))
            elif op == "search":
                rows = np.fromiter(sorted(live), np.int64)
                flat = FlatIndex(data[rows], Metric(args.metric))
                _, ids = flat.search(queries, k=min(args.k, len(rows)))
                out.append({"step": si, "gt": rows[ids].tolist()})
        with open(args.out, "w") as f:
            json.dump(out, f)
        print(f"wrote {len(out)} streaming groundtruth checkpoints to {args.out}")

    elif args.cmd == "compute-specificities":
        from collections import Counter

        counts: Counter = Counter()
        n = 0
        with open(args.labels) as f:
            for line in f:
                if not line.strip():
                    continue
                for lab in json.loads(line).get("labels", []):
                    counts[lab] += 1
                n += 1
        spec = {lab: c / max(n, 1) for lab, c in sorted(counts.items())}
        with open(args.out, "w") as f:
            json.dump(spec, f, indent=1)
        print(f"wrote specificities for {len(spec)} labels "
              f"(n={n}) to {args.out}")

    elif args.cmd == "relative-contrast":
        from diskann_tpu.flat import FlatIndex
        from diskann_tpu.ops.distance import Metric

        data = read_fbin(args.data)
        rng = np.random.default_rng(args.seed)
        sel = rng.choice(len(data), size=min(args.sample, len(data)),
                         replace=False)
        q = data[sel]
        dist, ids = FlatIndex(data, Metric(args.metric)).search(q, k=2)
        # nearest non-self neighbor
        d_nn = np.where(ids[:, 0] == sel, dist[:, 1], dist[:, 0])
        rand = rng.choice(len(data), size=len(sel))
        d_rand = np.linalg.norm(q - data[rand], axis=1) ** 2
        rc = float(d_rand.mean() / max(d_nn.mean(), 1e-12))
        print(json.dumps({
            "relative_contrast": rc,
            "mean_rand_dist": float(d_rand.mean()),
            "mean_nn_dist": float(d_nn.mean()),
            "sample": int(len(sel)),
        }))

    elif args.cmd == "gen-associated-data":
        rng = np.random.default_rng(args.seed)
        gt = json.load(open(args.range_gt))
        vals = np.full(args.n, -1, np.int64)
        for gi, row in enumerate(gt):
            for pid in row:
                if 0 <= pid < args.n:
                    vals[pid] = gi
        unassigned = vals < 0
        vals[unassigned] = rng.integers(0, max(len(gt), 1),
                                        size=int(unassigned.sum()))
        np.save(args.out if args.out.endswith(".npy") else args.out + ".npy",
                vals)
        print(f"wrote associated data for {args.n} points "
              f"({len(gt)} groups) to {args.out}")


if __name__ == "__main__":
    main()
