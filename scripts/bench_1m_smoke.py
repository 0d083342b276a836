"""Validate the 1M bench memory footprint: data gen + GT + a few insert
batches at full scale (doesn't run the whole build)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
from diskann_tpu.bench.harness import make_clustered

n, d, nq = 1_000_000, 128, 8192
t0 = time.time()
x, q = make_clustered(0, n, nq, d, n_clusters=4096, sigma=0.35, device=True)
print(f"data {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
flat = FlatIndex(x, Metric.L2)
_, gt = flat.search(np.asarray(q), k=10)
print(f"gt {time.time()-t0:.1f}s", flush=True)

cfg = GraphConfig(max_degree=64, l_build=100, beam_width=4)
idx = GraphIndex(d, cfg, capacity=n, insert_batch_size=8192,
                 search_batch_size=4096)
from diskann_tpu.graph import packed as packed_mod
xs = np.asarray(x[:65536])
proj, ps, pb = packed_mod.train_packed(xs, 32, cfg.metric)
idx.packed = packed_mod.alloc_packed(proj, ps, pb, idx.state.capacity,
                                     cfg.max_degree_with_slack)
xn = np.asarray(x)
del x
for i in range(3):
    t0 = time.time()
    idx.insert(xn[i * 8192 : (i + 1) * 8192])
    print(f"insert batch {i}: {time.time()-t0:.1f}s", flush=True)
print("1M memory footprint OK", flush=True)
