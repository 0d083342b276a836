"""Stage breakdown of the production packed search at bench shape.

Loads the cached 1M bench index and times, with an explicit sync after
each stage (RTT floor measured and reported separately):

  upload   : host->device of the [B, 128] query batch
  router   : router start-point matmul
  loop(mh) : beam_search_scored at max_hops in {2, 8, 14}  -> per-iter cost
  rerank   : full-precision rerank gather + sort + pack
  fetch    : one packed [B, 2k+2] i32 array to host

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_stage.py
Env: PS_B (8192), PS_L (120), PS_W (4)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/diskann_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)

B = int(os.environ.get("PS_B", 8192))
L = int(os.environ.get("PS_L", 120))
W = int(os.environ.get("PS_W", 4))
N, D, K = 1_000_000, 128, 10
REPS = 3


def sync(x):
    np.asarray(jax.numpy.ravel(x)[:1])


def main():
    from diskann_tpu.graph.index import GraphIndex, _pack_outputs, _rerank
    from diskann_tpu.graph.search import beam_search_scored
    from diskann_tpu.bench.harness import make_clustered

    idx_cache = f"/tmp/diskann_bench_idx_s0_c4096_sig0.35_{N}_{D}_R64"
    t0 = time.time()
    idx = GraphIndex.load(idx_cache, search_batch_size=B)
    LOG(f"[ps] index loaded in {time.time()-t0:.0f}s")
    _, q = make_clustered(0, 1024, B, D, n_clusters=4096, sigma=0.35,
                          device=True)
    qn = np.asarray(q)

    # RTT floor: sync on an already-materialized tiny array
    one = jnp.zeros((8,), jnp.int32)
    sync(one)
    floors = []
    for _ in range(5):
        t0 = time.time()
        sync(one)
        floors.append(time.time() - t0)
    rtt = float(np.median(floors))
    LOG(f"[ps] rtt floor {rtt*1e3:.1f}ms")

    def timed(name, fn, warm=1):
        for _ in range(warm):
            sync(fn())
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            sync(fn())
            ts.append(time.time() - t0)
        ms = (np.median(ts) - rtt) * 1e3
        LOG(f"[ps] {name:12s} {ms:8.1f} ms")
        return ms

    timed("upload", lambda: jnp.asarray(qn))

    q_dev = jnp.asarray(qn)
    sync(q_dev)
    timed("router", lambda: idx._router_starts(q_dev, "packed"))

    rstart = idx._router_starts(q_dev, "packed")
    start = rstart if rstart is not None else idx._start()
    sdef, sdata, _ = idx._scorer_for_mode("packed")

    def loop(mh):
        res = beam_search_scored(
            sdef, sdata, idx.state.adjacency, start, q_dev,
            l_search=L, beam_width=W, max_hops=mh,
            history_capacity=idx.config.history_capacity(L),
            dedup="list", expand_r=idx.packed.r_pack,
        )
        return res.ids

    ms2 = timed("loop mh=2", lambda: loop(2))
    ms8 = timed("loop mh=8", lambda: loop(8))
    ms14 = timed("loop mh=14", lambda: loop(14))
    LOG(f"[ps] per-iter {(ms14-ms2)/12:.2f} ms; loop fixed {ms2-2*(ms14-ms2)/12:.1f} ms")

    res = beam_search_scored(
        sdef, sdata, idx.state.adjacency, start, q_dev,
        l_search=L, beam_width=W, max_hops=14,
        history_capacity=idx.config.history_capacity(L),
        dedup="list", expand_r=idx.packed.r_pack,
    )
    sync(res.ids)

    def rerank():
        fd, fi = _rerank(res.ids, q_dev, idx.state.vectors,
                         idx.state.sq_norms, idx.state.valid,
                         idx.config.metric, K)
        return _pack_outputs(fd, fi, res.cmps, res.hops)

    timed("rerank+pack", rerank)

    packed_out = rerank()
    sync(packed_out)
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        np.asarray(packed_out)
        ts.append(time.time() - t0)
    LOG(f"[ps] fetch        {(np.median(ts)-rtt)*1e3:8.1f} ms "
        f"({packed_out.nbytes/1e6:.2f} MB)")

    # end-to-end reference point through the public API
    idx.search(qn, K, l_search=L, mode="packed", beam_width=W, max_hops=14)
    t0 = time.time()
    idx.search(qn, K, l_search=L, mode="packed", beam_width=W, max_hops=14)
    dt = time.time() - t0
    LOG(f"[ps] end-to-end   {dt*1e3:8.1f} ms  ({B/dt:.0f} QPS)")


if __name__ == "__main__":
    main()
