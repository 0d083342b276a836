"""Piecewise profile of the composed headline program at the scored
operating point (B=2048, L=20, W=4, mh=6, rl=12, dp=128, router 64k).

Battery 1+2 showed the knobs (L, W, mh, starts, merge width, sub-batch)
move QPS by <10%, so the ~17ms/sub-batch of non-expand time must sit in a
fixed stage.  This times ablated programs sharing the exact production
pieces: dispatch floor, router only, router+traversal at mh in {3, 6}
(slope = per-hop cost, intercept = fixed), +rerank, +pack.  Interleaved
reps, min-of-3, floor-subtracted.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_profile.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/xla_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diskann_tpu import GraphIndex  # noqa: E402
from diskann_tpu.bench.harness import make_clustered  # noqa: E402
from diskann_tpu.graph.index import (  # noqa: E402
    _pack_outputs, _rerank, _router_topk_packed_pre,
)
from diskann_tpu.graph.search import beam_search_scored  # noqa: E402

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)

N, D, K, B = 1_000_000, 128, 10, 2048
L, W, MH, RL = 20, 4, 6, 12
CACHE = "/root/repo/.cache"


def main():
    _, q = make_clustered(0, N, B, D, n_clusters=4096, sigma=0.35,
                          device=True)
    qn = np.asarray(q)[:B].astype(np.float16)

    t0 = time.time()
    idx = GraphIndex.load(f"{CACHE}/idx_s0_c4096_sig0.35_{N}_{D}_R64",
                          search_batch_size=B)
    LOG(f"[prof] loaded in {time.time()-t0:.0f}s")
    t0 = time.time()
    idx.attach_packed(dp=128, writable=False)
    LOG(f"[prof] attached dp=128 in {time.time()-t0:.0f}s")

    sdef, sdata, _ = idx._scorer_for_mode("packed")
    router_ids = idx._router_ids_live("packed")
    router_codes = idx._router_rows(True)
    cfg = idx.config
    metric = cfg.metric
    hist = cfg.history_capacity(L)
    st_fixed = idx._start()
    state = idx.state

    # arrays ride as jit ARGUMENTS: closure-captured multi-GB constants
    # are serialized into the remote compile request (HTTP 413, CLAUDE.md)
    expand_r = idx.packed.r_pack

    def router_start(q32, router_codes):
        rc, raux, proj, pscale, pbias2 = router_codes
        return _router_topk_packed_pre(
            rc, raux, proj, pscale, pbias2, router_ids, q32, metric, 4,
            compute="bf16",
        )

    progs = {}

    @jax.jit
    def p_floor(qw, sdata, adjacency, vectors, sq_norms, valid,
                router_codes):
        return qw[:1, :1].astype(jnp.float32)

    progs["floor"] = p_floor

    @jax.jit
    def p_router(qw, sdata, adjacency, vectors, sq_norms, valid,
                 router_codes):
        return router_start(qw.astype(jnp.float32), router_codes)[:, :1]

    progs["router"] = p_router

    def make_trav(mh, rl=None, pack=False, mtrunc=False):
        @jax.jit
        def p(qw, sdata, adjacency, vectors, sq_norms, valid, router_codes):
            q32 = qw.astype(jnp.float32)
            st = router_start(q32, router_codes)
            res = beam_search_scored(
                sdef, sdata, adjacency, st, q32,
                l_search=L, beam_width=W, max_hops=mh,
                history_capacity=hist, dedup="list",
                expand_r=expand_r, unroll=True,
                merge_trunc=mtrunc,
            )
            if rl is None:
                return res.ids[:, :1]
            fd, fi = _rerank(res.ids[:, :rl], q32, vectors,
                             sq_norms, valid, metric, K)
            if pack:
                return _pack_outputs(fd, fi, res.cmps, res.hops)
            return fi[:, :1]

        return p

    progs["trav_mh3"] = make_trav(3)
    progs["trav_mh6"] = make_trav(6)
    progs["trav6_rerank"] = make_trav(6, rl=RL)
    progs["trav6_rerank_pack"] = make_trav(6, rl=RL, pack=True)

    qd = jnp.asarray(qn)
    argv = (sdata, state.adjacency, state.vectors, state.sq_norms,
            state.valid, router_codes)

    # compile all
    for name, p in progs.items():
        t0 = time.time()
        np.asarray(p(qd, *argv))
        LOG(f"[prof] {name}: compiled in {time.time()-t0:.1f}s")

    walls = {n: [] for n in progs}
    for rnd in range(5):
        for name, p in progs.items():
            t0 = time.time()
            np.asarray(p(qd, *argv))
            walls[name].append(time.time() - t0)
    floor = min(walls["floor"])
    LOG(f"[prof] dispatch floor (upload+RTT): {floor*1e3:.1f}ms")
    res = {n: min(w) for n, w in walls.items()}
    for n in progs:
        LOG(f"[prof] {n}: {res[n]*1e3:.1f}ms  (-floor: "
            f"{(res[n]-floor)*1e3:.1f}ms)  all="
            f"{[round(x*1e3) for x in walls[n]]}")
    hop = (res["trav_mh6"] - res["trav_mh3"]) / 3
    fixed = res["trav_mh3"] - 3 * hop - (res["router"] - floor) - floor
    LOG(f"[prof] per-hop: {hop*1e3:.2f}ms; router: "
        f"{(res['router']-floor)*1e3:.2f}ms; traversal-fixed: "
        f"{fixed*1e3:.2f}ms; rerank: "
        f"{(res['trav6_rerank']-res['trav_mh6'])*1e3:.2f}ms; pack: "
        f"{(res['trav6_rerank_pack']-res['trav6_rerank'])*1e3:.2f}ms")


if __name__ == "__main__":
    main()
