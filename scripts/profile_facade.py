"""Find where facade search time goes vs direct beam_search_scored."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from diskann_tpu import GraphConfig, GraphIndex
from diskann_tpu.bench.harness import make_clustered
from diskann_tpu.graph.scorers import packed_scorer
from diskann_tpu.graph.search import beam_search_scored
from diskann_tpu.graph.index import _rerank

n, d, nq = 200_000, 128, 4096
x, q = make_clustered(0, n, nq, d, n_clusters=4096, sigma=0.35, device=True)
cfg = GraphConfig(max_degree=64, l_build=100, beam_width=4)
t0 = time.time()
idx = GraphIndex.build(np.asarray(x), cfg, insert_batch_size=8192,
                       search_batch_size=4096, build_mode="packed",
                       packed_dp=32)
print(f"build {time.time()-t0:.1f}s", flush=True)

qn = np.asarray(q)
L = 60

def T(name, f, reps=3):
    f()
    t0 = time.time()
    for _ in range(reps):
        r = f()
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt*1e3:.0f}ms ({nq/dt:.0f} qps)", flush=True)
    return r

T("facade packed", lambda: idx.search(qn, 10, l_search=L, mode="packed"))

p = idx.packed
sdef, sdata = packed_scorer(
    idx.state.adjacency, p.nbr_codes, p.nbr_aux, p.proj, p.pscale, p.pbias2,
    p.self_codes, p.self_aux, cfg.metric,
)
qd = jnp.asarray(qn)
start = idx._start()

def direct():
    res = beam_search_scored(
        sdef, sdata, idx.state.adjacency, start, qd,
        l_search=L, beam_width=4, max_hops=cfg.max_hops, dedup="list",
    )
    _ = np.asarray(res.hops[:1])
    return res

res = T("direct scored", direct)
print("hops", np.asarray(res.hops).mean(), flush=True)

def rr():
    d_, i_ = _rerank(res.ids, qd, idx.state.vectors, idx.state.sq_norms,
                     idx.state.valid, cfg.metric, 10)
    _ = np.asarray(i_[:1, :1])
T("rerank", rr)

def st():
    s = idx._start()
    _ = np.asarray(s)
T("start medoid", st)

# history_capacity difference: facade passes history_capacity even for list
def direct_hist():
    res = beam_search_scored(
        sdef, sdata, idx.state.adjacency, start, qd,
        l_search=L, beam_width=4, max_hops=cfg.max_hops,
        history_capacity=cfg.history_capacity(L), dedup="list",
    )
    _ = np.asarray(res.hops[:1])
T("direct + histcap arg", direct_hist)
