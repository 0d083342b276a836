"""Filtered search at the 50M >HBM operating point (VERDICT r4 item 5's
"measured in the DEEP artifact" clause, at 2.5x the asked-for scale).

Loads the saved 50M PQ-codes tier (built by bench_deep50m.py), attaches a
zipf categorical label per point, computes exact filtered groundtruth for
one broad predicate by scanning the member rows on-device, then measures
`TieredIndex.search_filtered` — the unified composed path: router entry
points + pq traversal with the inline beta filter + staged exact rerank.

Appends a "filtered" section into BENCH_DEEP50M_r05.json.

Run (after bench_deep50m.py): PYTHONPATH=/root/repo:/root/.axon_site \
    nohup python scripts/bench_deep50m_filtered.py > /tmp/deep50f.log 2>&1 &
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/xla_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

LOG = lambda *a: print("[deep50f]", *a, file=sys.stderr, flush=True)

N = int(os.environ.get("DEEP_N", 50_000_000))
D, NQ, K = 128, 1024, 10
SHARDS = int(os.environ.get("DEEP_SHARDS", 60))
R = int(os.environ.get("DEEP_R", 40))
_BASE = "/root/repo/.cache/deep50"
FBIN = f"{_BASE}/deep_50000000_{D}.fbin"
QNPY = f"{_BASE}/deep_50000000_{D}_q{NQ}.npy"
IDXDIR = f"{_BASE}/deep_idx_{N}_pq4_R{R}_s{SHARDS}"
OUT = "/root/repo/BENCH_DEEP50M_r05.json"
PRED = "cat0"          # zipf head category, ~11% of points
FGT = f"{_BASE}/fgt_{PRED}_{N}_{NQ}.npy"


def main():
    from diskann_tpu import FlatIndex, Metric
    from diskann_tpu.bench.recall import knn_recall
    from diskann_tpu.io_.fbin import read_fbin
    from diskann_tpu.tiered.index import HostVectorStore, TieredIndex

    q = np.load(QNPY)
    LOG(f"loading saved index from {IDXDIR}")
    t0 = time.time()
    tiered = TieredIndex.load(IDXDIR)
    LOG(f"loaded in {time.time()-t0:.0f}s")
    tiered.store = HostVectorStore.from_fbin(FBIN, cache_rows=1 << 20)
    tiered.store.n = N
    tiered.io_limit = None
    tiered.attach_router(size=65536)

    # zipf labels, seeded (same scheme as the 1M bench's filtered family)
    lrng = np.random.default_rng(0xF117)
    weights = 1.0 / np.arange(1, 33) ** 0.8
    weights /= weights.sum()
    cats = lrng.choice(32, size=N, p=weights).astype(np.int8)
    members = np.nonzero(cats == 0)[0]
    LOG(f"predicate {PRED!r}: {len(members)} members "
        f"({len(members)/N:.1%})")
    # label bitsets without the per-point python list (50M lists would
    # take minutes): LabelSet from integer categories
    from diskann_tpu.filters import LabelSet

    vocab = {f"cat{c}": c for c in range(32)}
    cap = tiered.graph.state.capacity
    ls = LabelSet(cap, vocab, n_words=1)
    bits_np = np.zeros((cap, 1), np.uint32)
    bits_np[np.arange(N), 0] = np.uint32(1) << cats.astype(np.uint32)
    ls.bits = jnp.asarray(bits_np)
    tiered.graph.labels = ls
    del bits_np
    gc.collect()

    vecs = read_fbin(FBIN, mmap=True)
    if os.path.exists(FGT):
        fgt = np.load(FGT)
    else:
        LOG("computing exact filtered GT over member rows (on-device slabs)")
        t0 = time.time()
        slab = 1 << 22
        all_d, all_i = [], []
        for off in range(0, len(members), slab):
            m = members[off:off + slab]
            xd = jnp.asarray(np.asarray(vecs[m], np.float32))
            flat = FlatIndex(xd, Metric.L2)
            d_s, i_s = flat.search(q, k=K, chunk=256)
            all_d.append(np.asarray(d_s))
            all_i.append(m[np.asarray(i_s)])
            del flat, xd
            gc.collect()
            LOG(f"fgt slab {off//slab+1}/{(len(members)+slab-1)//slab} "
                f"({time.time()-t0:.0f}s)")
        ds = np.concatenate(all_d, axis=1)
        iid = np.concatenate(all_i, axis=1)
        order = np.argsort(ds, axis=1, kind="stable")[:, :K]
        fgt = np.take_along_axis(iid, order, axis=1)
        np.save(FGT, fgt)
        LOG(f"filtered GT in {time.time()-t0:.0f}s")

    rows = []
    for l, mh in ((80, 24), (160, 32)):
        kw = dict(l_search=l, beam_width=4, max_hops=mh, router_starts=4,
                  query_dtype=np.float16, row_wire=np.float16,
                  batch_size=1024)
        t0 = time.time()
        _, ids, _ = tiered.search_filtered(q, PRED, K, **kw)  # compile
        LOG(f"compile+first L={l}: {time.time()-t0:.0f}s")
        t0 = time.time()
        _, ids, st = tiered.search_filtered(q, PRED, K, **kw)
        dt = time.time() - t0
        r = knn_recall(ids, fgt, K)
        row = {"predicate": PRED, "l": l, "max_hops": mh,
               "recall": round(float(r), 4), "qps": round(NQ / dt),
               "hops_mean": float(np.asarray(st.hops).mean())}
        rows.append(row)
        LOG(json.dumps(row))

    # splice into the main artifact
    try:
        with open(OUT) as f:
            art = json.loads(f.read())
    except Exception:
        art = {"metric": "deep50m_tiered_filtered_only", "value": 0,
               "unit": "qps", "extra": {}}
    art["extra"]["filtered"] = rows
    with open(OUT, "w") as f:
        f.write(json.dumps(art) + "\n")
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
