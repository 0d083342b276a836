"""Single-core CPU Vamana baseline — the measured denominator for
BASELINE.md's "x-faster than the reference" claims.

The Rust reference itself cannot be built on this host (no rustc/cargo in
the image, zero egress — verified `which cargo rustc` empty), so this is a
numpy-BLAS implementation of the SAME algorithm with the reference's
semantics and defaults (alpha=1.2, slack=1.3, per-insert greedy search +
RobustPrune + backedges — `diskann/src/graph/index.rs:226-338,2565-2777`),
one vector at a time like the reference's insert path.  numpy's C/BLAS
kernels put the distance math within a small factor of hand-SIMD Rust for
these shapes; the reference CI runs 8 build threads / 4 search threads
(this host has ONE core), so scale accordingly when comparing.

Run: python scripts/cpu_reference_baseline.py  (env: CB_N, CB_NQ, CB_D)
Prints one JSON line with build pts/s and single-query QPS + recall@10.
"""

import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("CB_N", 100_000))
NQ = int(os.environ.get("CB_NQ", 512))
D = int(os.environ.get("CB_D", 128))
R = int(os.environ.get("CB_R", 64))
L_BUILD = int(os.environ.get("CB_L", 100))
L_SEARCH = int(os.environ.get("CB_LS", 100))
ALPHA = 1.2
SLACK = 1.3
K = 10

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)


def make_clustered(seed, n, nq, d, n_clusters=4096, sigma=0.35):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    a = rng.integers(0, n_clusters, size=n)
    x = centers[a] + sigma * rng.standard_normal((n, d)).astype(np.float32)
    qa = rng.integers(0, n_clusters, size=nq)
    q = centers[qa] + sigma * rng.standard_normal((nq, d)).astype(np.float32)
    return x, q


class VamanaCPU:
    """Reference-semantics Vamana: per-insert greedy search + RobustPrune."""

    def __init__(self, n_cap, d):
        self.vecs = np.zeros((n_cap, d), np.float32)
        self.r_slack = int(R * SLACK)
        self.adj = [[] for _ in range(n_cap)]
        self.n = 0
        self.start = 0

    def _dists(self, q, ids):
        v = self.vecs[ids]
        diff = v - q
        return np.einsum("ij,ij->i", diff, diff)

    def search(self, q, l):
        """Greedy best-first search (index.rs:1933-2000): sorted best list
        of size l, expand closest unexpanded until none left."""
        best_ids = [self.start]
        best_d = list(self._dists(q, np.array([self.start])))
        expanded = set()
        visited = {self.start}
        pool = {self.start: best_d[0]}
        while True:
            nxt = -1
            for i, bid in enumerate(best_ids):
                if bid not in expanded:
                    nxt = bid
                    break
            if nxt < 0:
                break
            expanded.add(nxt)
            nbrs = [x for x in self.adj[nxt] if x not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            nd = self._dists(q, np.array(nbrs))
            for x, dx in zip(nbrs, nd):
                pool[x] = dx
            best_ids.extend(nbrs)
            best_d = self._dists(q, np.array(best_ids))
            order = np.argsort(best_d, kind="stable")[:l]
            best_ids = [best_ids[i] for i in order]
        return best_ids, pool

    def robust_prune(self, p_vec, pool_ids, pool_d, degree):
        """occlude_list (index.rs:2565-2777): alpha ladder 1.0 -> ALPHA."""
        order = np.argsort(pool_d, kind="stable")
        cand = [(pool_ids[i], pool_d[i]) for i in order]
        result = []
        alpha = 1.0
        occluded = [c for c in cand]
        while len(result) < degree and occluded and alpha <= ALPHA + 1e-9:
            cand, occluded = occluded, []
            for cid, cd in cand:
                if len(result) >= degree:
                    break
                ok = True
                for rid, _ in result:
                    drc = self.vecs[rid] - self.vecs[cid]
                    d_rc = float(drc @ drc)
                    if d_rc * alpha < cd:
                        ok = False
                        break
                if ok:
                    result.append((cid, cd))
                else:
                    occluded.append((cid, cd))
            alpha *= min(ALPHA, 1.2)
        return [r for r, _ in result]

    def insert(self, vec):
        i = self.n
        self.vecs[i] = vec
        self.n += 1
        if i == 0:
            return
        _, pool = self.search(vec, L_BUILD)
        ids = np.fromiter(pool.keys(), np.int64, len(pool))
        ds = np.fromiter(pool.values(), np.float64, len(pool))
        new_nbrs = self.robust_prune(vec, ids, ds, R)
        self.adj[i] = list(new_nbrs)
        for src in new_nbrs:
            lst = self.adj[src]
            if i not in lst:
                lst.append(i)
                if len(lst) > self.r_slack:
                    pd = self._dists(self.vecs[src], np.array(lst))
                    self.adj[src] = self.robust_prune(
                        self.vecs[src], np.array(lst), pd, R
                    )


def main():
    x, q = make_clustered(0, N, NQ, D)
    LOG(f"[cpu-base] building Vamana n={N} d={D} R={R} L={L_BUILD} "
        f"(single core, numpy BLAS)")
    idx = VamanaCPU(N, D)
    t0 = time.time()
    report = max(N // 20, 1)
    for i in range(N):
        idx.insert(x[i])
        if (i + 1) % report == 0:
            el = time.time() - t0
            LOG(f"[cpu-base] {i+1}/{N} ({(i+1)/el:.0f} pts/s)")
    build_s = time.time() - t0
    pts_per_s = N / build_s

    # exact groundtruth on a subsample of queries (BLAS scan)
    LOG("[cpu-base] groundtruth")
    gt = np.empty((NQ, K), np.int64)
    for j in range(NQ):
        d = np.einsum("ij,ij->i", x - q[j], x - q[j])
        gt[j] = np.argpartition(d, K)[:K][np.argsort(d[np.argpartition(d, K)[:K]])]

    LOG("[cpu-base] searching (one query at a time, reference style)")
    t0 = time.time()
    hits = 0
    for j in range(NQ):
        ids, _ = idx.search(q[j], L_SEARCH)
        hits += len(set(ids[:K]) & set(gt[j]))
    search_s = time.time() - t0
    qps = NQ / search_s
    recall = hits / (NQ * K)

    print(json.dumps({
        "metric": "cpu_reference_baseline",
        "n": N, "d": D, "r": R, "l_build": L_BUILD, "l_search": L_SEARCH,
        "build_points_per_s": round(pts_per_s, 1),
        "build_s": round(build_s, 1),
        "qps_1thread": round(qps, 1),
        "recall_at_10": round(recall, 4),
        "host": "1 CPU core (reference CI: 8 build / 4 search threads)",
    }), flush=True)


if __name__ == "__main__":
    main()
