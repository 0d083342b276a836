"""Sharded-index bookkeeping at 10M points: O(batch) host work, no O(N)
host id map, device-side delete lookup, per-shard slot recycling, binary
(non-JSON) id persistence.

Round-2 review flagged the old design (host `_loc` dict with one entry per
external id, per-row Python insert routing, JSON-string id keys in the
manifest — O(N) host RAM and a multi-GB manifest at 1B scale).  The rebuilt
bookkeeping keeps external ids ON DEVICE in the per-shard `ext` columns
(`parallel/sharded.py`), routes inserts with one vectorized argsort, and
scans membership on device for deletes — reference semantics:
`diskann-disk/src/utils/partition.rs:23` (overlap assignment) +
`diskann-inmem/src/freelist.rs` (slot recycling).

This script PROVES the scale claim on an 8-virtual-device CPU mesh by
adopting a synthetic 10M-point sharded graph (ring adjacency — structurally
valid: no dups, no self-loops, degree counts consistent — built directly on
device; a real 10M CPU build would measure XLA matmul speed, not
bookkeeping), then timing insert / delete / re-insert / save / load and
recording host-side memory growth.  Writes SHARDED10M_r04.json.

Run: python scripts/bench_sharded10m.py
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, "/root/repo")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA-CPU compiles of the sharded insert pipeline take tens of minutes on
# this one-core box; persist them so reruns (and the warmup below) are cheap
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/diskann_cpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

LOG = lambda *a: print("[sh10m]", *a, file=sys.stderr, flush=True)

N = int(os.environ.get("SH10M_N", 10_000_000))
D = int(os.environ.get("SH10M_D", 32))
R = 16
BATCH = 8192
OUT = "/root/repo/SHARDED10M_r04.json"


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def adopt_synthetic(idx, n_total):
    """Fill the sharded index with a structurally-valid synthetic graph,
    entirely on device: ring adjacency (slot i -> i+1..i+R mod ns), all
    rows distinct / no self-loops, round-robin external ids (slot i of
    shard s holds ext id i*S + s < n_total)."""
    from diskann_tpu.graph.state import GraphArrays

    s_count = idx.n_shards
    ns = n_total // s_count
    cap = idx.cap_per_shard
    assert ns <= cap

    @jax.jit
    def fill(key):
        def one(k, s):
            vecs = jax.random.normal(k, (cap, D), jnp.float32)
            slot = jnp.arange(cap, dtype=jnp.int32)
            adj = (slot[:, None] + jnp.arange(1, R + 1, dtype=jnp.int32)) % ns
            live = slot < ns
            adj = jnp.where(live[:, None], adj, -1)
            adj = jnp.pad(adj, ((0, 0), (0, idx.config.max_degree_with_slack - R)),
                          constant_values=-1)
            vecs = jnp.where(live[:, None], vecs, 0.0)
            st = GraphArrays(
                vectors=vecs,
                sq_norms=jnp.sum(vecs * vecs, axis=1),
                adjacency=adj,
                degrees=jnp.where(live, R, 0).astype(jnp.int32),
                valid=live,
                vec_sum=jnp.sum(vecs, axis=0),
            )
            ext = jnp.where(live, slot * s_count + s, -1).astype(jnp.int32)
            return st, ext

        keys = jax.random.split(key, s_count)
        return jax.vmap(one)(keys, jnp.arange(s_count, dtype=jnp.int32))

    stacked, ext = fill(jax.random.key(0))
    sh = idx._shard_sharding
    idx.stacked = jax.device_put(stacked, sh)
    idx.ext = jax.device_put(ext, sh)
    idx.ns = jax.device_put(
        jnp.full((s_count,), ns, jnp.int32), sh)
    idx.starts = jax.device_put(
        jnp.zeros((s_count, 1), jnp.int32), sh)
    idx.next_ext = ns * s_count
    jax.block_until_ready(idx.stacked.vectors)


def main():
    from diskann_tpu.graph.config import GraphConfig
    from diskann_tpu.parallel import ShardedGraphIndex

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("shard",))
    s_count = len(devs)
    cap = (N // s_count) + 3 * BATCH  # headroom so insert never grows

    cfg = GraphConfig(max_degree=R, l_build=32, beam_width=4,
                      build_max_hops=8, max_occlusion_size=64)
    idx = ShardedGraphIndex(mesh, D, cfg, cap_per_shard=cap)
    rss0 = rss_mb()
    LOG(f"adopting synthetic {N} x {D} over {s_count} shards "
        f"(cap/shard {cap}); rss {rss0:.0f}MB")
    t0 = time.time()
    adopt_synthetic(idx, N)
    t_adopt = time.time() - t0
    LOG(f"adopted in {t_adopt:.1f}s; rss {rss_mb():.0f}MB")

    rng = np.random.default_rng(3)
    timings = {}

    @jax.jit
    def device_free_count(valid, ns):
        iota = jnp.arange(valid.shape[1], dtype=jnp.int32)
        return ((~valid) & (iota[None, :] < ns[:, None])).sum()

    # ---- warmup: compile the insert + delete pipelines at the timed
    # shapes (XLA-CPU compiles run tens of minutes on this box; the timed
    # sections below must measure bookkeeping, not the compiler) ----
    t0 = time.time()
    w_ids = idx.insert(
        rng.standard_normal((BATCH, D)).astype(np.float32),
        rng.integers(0, s_count, size=(BATCH, 2)),
    )
    jax.block_until_ready(idx.stacked.vectors)
    idx.delete(np.asarray(w_ids))
    jax.block_until_ready(idx.stacked.valid)
    # second insert/delete round: recycle-vs-append is data-dependent inside
    # one jitted program (traced take/where), so this round compiles nothing
    # new — its value is leaving FREE SLOTS behind, so the timed insert
    # below exercises the slot-recycle path at runtime
    w_ids2 = idx.insert(
        rng.standard_normal((BATCH, D)).astype(np.float32),
        rng.integers(0, s_count, size=(BATCH, 2)),
    )
    jax.block_until_ready(idx.stacked.vectors)
    idx.delete(np.asarray(w_ids2))
    jax.block_until_ready(idx.stacked.valid)
    timings["warmup_compile_s"] = round(time.time() - t0, 2)
    LOG(f"warmup (insert+delete compile x2) {timings['warmup_compile_s']}s")

    # ---- insert a batch with 2-way overlap routing (real build kernel) ----
    newv = rng.standard_normal((BATCH, D)).astype(np.float32)
    assign = rng.integers(0, s_count, size=(BATCH, 2))
    t0 = time.time()
    ext_ids = idx.insert(newv, assign)
    jax.block_until_ready(idx.stacked.vectors)
    timings["insert_8192_overlap2_s"] = round(time.time() - t0, 2)
    assert len(ext_ids) == BATCH and idx.next_ext == N + 3 * BATCH

    # host-side routing cost alone (the only Python work in insert):
    t0 = time.time()
    a = np.sort(assign, axis=1)
    keep = a >= 0
    keep[:, 1:] &= a[:, 1:] != a[:, :-1]
    _ = np.argsort(a[keep].astype(np.int64), kind="stable")
    timings["host_routing_only_ms"] = round((time.time() - t0) * 1e3, 2)

    # ---- delete a scattered batch (device-side ext-column scan) ----
    dead = rng.choice(N, size=BATCH, replace=False)
    t0 = time.time()
    idx.delete(dead)
    jax.block_until_ready(idx.stacked.valid)
    timings["delete_8192_s"] = round(time.time() - t0, 2)
    free_after_delete = int(
        device_free_count(idx.stacked.valid, idx.ns))
    assert free_after_delete >= BATCH  # every copy of every id found

    # ---- re-insert: freed slots recycle before ns grows ----
    ns_before = np.asarray(idx.ns).copy()
    t0 = time.time()
    idx.insert(rng.standard_normal((BATCH, D)).astype(np.float32),
               rng.integers(0, s_count, size=(BATCH, 2)))
    jax.block_until_ready(idx.stacked.vectors)
    timings["reinsert_8192_s"] = round(time.time() - t0, 2)
    ns_after = np.asarray(idx.ns)
    recycled = free_after_delete - int(
        device_free_count(idx.stacked.valid, idx.ns))
    LOG(f"recycled {recycled} freed slots "
        f"(ns grew {int((ns_after - ns_before).sum())})")
    assert recycled >= BATCH // 2  # freelist engaged, not append-only

    # ---- search still returns valid external ids ----
    q = rng.standard_normal((64, D)).astype(np.float32)
    d, i, _ = idx.search(q, k=10)
    assert ((i >= 0) & (i < idx.next_ext)).all()

    # ---- save / load: binary ids, O(1) manifest ----
    path = "/tmp/sh10m_idx"
    t0 = time.time()
    idx.save(path)
    timings["save_s"] = round(time.time() - t0, 2)
    manifest = os.path.getsize(os.path.join(path, "manifest.json"))
    total_bytes = sum(
        os.path.getsize(os.path.join(path, f)) for f in os.listdir(path)
    )
    t0 = time.time()
    idx2 = ShardedGraphIndex.load(mesh, path)
    timings["load_s"] = round(time.time() - t0, 2)
    d2, i2, _ = idx2.search(q, k=10)
    assert (np.asarray(i2) == np.asarray(i)).all()

    rss_peak = rss_mb()
    out = {
        "metric": "sharded10m_bookkeeping",
        "value": timings["insert_8192_overlap2_s"],
        "unit": "s_per_8192_insert",
        "extra": {
            "n": N, "d": D, "n_shards": s_count, "adopt_s": round(t_adopt, 1),
            **timings,
            "recycled_slots": recycled,
            "manifest_bytes": manifest,
            "saved_bytes": total_bytes,
            "rss_start_mb": round(rss0), "rss_peak_mb": round(rss_peak),
            "host_per_id_state": "none (next_ext counter only; ids live in "
                                 "device ext columns, binary on disk)",
        },
    }
    with open(OUT, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
