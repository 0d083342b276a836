"""Diagnose the recall ceiling: are gt misses unreachable from the entry?

Builds a small clustered index on CPU, computes exact reachability from
the medoid (BFS over the adjacency), and checks whether the plateaued
recall misses are exactly the unreachable nodes.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/diag_connectivity.py
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
from diskann_tpu.bench.harness import make_clustered
from diskann_tpu.bench.recall import knn_recall

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)


def main():
    n, nq, d = 20000, 512, 32
    x, q = make_clustered(0, n, nq, d, n_clusters=512, sigma=0.35)
    x, q = np.asarray(x), np.asarray(q)

    _, gt = FlatIndex(x, Metric.L2).search(q, k=10)

    cfg = GraphConfig(max_degree=32, l_build=64, beam_width=4)
    idx = GraphIndex.build(x, cfg, insert_batch_size=2048,
                           build_mode="packed", packed_dp=32)

    adj = np.asarray(idx.state.adjacency[:n])
    deg_in = np.bincount(adj[adj >= 0], minlength=n)
    LOG(f"[dc] in-degree 0 nodes: {(deg_in == 0).sum()}")

    # BFS from the medoid
    start = int(np.asarray(idx._start())[0])
    reached = np.zeros(n, bool)
    reached[start] = True
    frontier = [start]
    while frontier:
        nxt = adj[frontier]
        nxt = np.unique(nxt[nxt >= 0])
        nxt = nxt[~reached[nxt]]
        reached[nxt] = True
        frontier = nxt.tolist()
    LOG(f"[dc] unreachable from medoid: {(~reached).sum()} / {n}")

    for l in (40, 80, 160):
        _, ids, _ = idx.search(q, k=10, l_search=l, mode="packed")
        r = knn_recall(ids, gt, 10)
        # which gt entries were missed?
        missed = []
        for row in range(nq):
            got = set(ids[row][ids[row] >= 0].tolist())
            for g in gt[row]:
                if int(g) not in got:
                    missed.append(int(g))
        missed = np.array(missed, np.int64)
        un = (~reached[missed]).mean() if len(missed) else 0.0
        LOG(f"[dc] L={l}: recall={r:.4f} misses={len(missed)} "
            f"unreachable-share={un:.2%}")
    print("DONE")


if __name__ == "__main__":
    main()
