"""Measure packed-build insert throughput on the real TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
from diskann_tpu.graph.build import insert_batch
from diskann_tpu.graph import state as gs, packed as pk
from diskann_tpu.graph.config import GraphConfig
from diskann_tpu.ops.distance import Metric

n_seed, d, M, DP = 500_000, 128, 8192, 32
cfg = GraphConfig(max_degree=64, l_build=100, beam_width=4)
st = gs.alloc(1_000_000, d, cfg.max_degree_with_slack)
V = jax.random.normal(jax.random.key(0), (n_seed, d), jnp.float32)
st = gs.set_vectors(st, jnp.arange(n_seed, dtype=jnp.int32), V)
adj = jax.random.randint(jax.random.key(1), (n_seed, 64), 0, n_seed, jnp.int32)
st = st._replace(
    adjacency=st.adjacency.at[:n_seed, :64].set(adj),
    degrees=st.degrees.at[:n_seed].set(64),
)
proj, ps, pb = pk.train_packed(np.asarray(V[:65536]), DP, Metric.L2)
p = pk.alloc_packed(proj, ps, pb, 1_000_000, cfg.max_degree_with_slack)
codes, aux = pk.encode(p, V, Metric.L2)
p = pk.set_self_codes_donated(p, jnp.arange(n_seed, dtype=jnp.int32), codes, aux)
for off in range(0, 1_000_000, 131072):
    rows = jnp.arange(off, min(off + 131072, 1_000_000), dtype=jnp.int32)
    if rows.shape[0] < 131072:
        rows = jnp.pad(rows, (0, 131072 - rows.shape[0]), constant_values=-1)
    p = pk.refresh_rows_donated(p, st.adjacency, rows)
_ = np.asarray(p.nbr_aux[:1, :1])
print("packed ready", flush=True)
newv = jax.random.normal(jax.random.key(2), (M, d), jnp.float32)
rv = jnp.ones((M,), bool)
start = jnp.zeros((1,), jnp.int32)
slots = n_seed + jnp.arange(M, dtype=jnp.int32)
t0 = time.time()
st, p, stats = insert_batch(st, slots, newv, rv, start, cfg, p)
_ = np.asarray(st.degrees[:1])
print("packed insert compile+run", round(time.time() - t0, 1), flush=True)
for i in range(3):
    slots = n_seed + (i + 1) * M + jnp.arange(M, dtype=jnp.int32)
    t0 = time.time()
    st, p, stats = insert_batch(st, slots, newv, rv, start, cfg, p)
    _ = np.asarray(st.degrees[:1])
    dt = time.time() - t0
    print(f"packed insert M={M}: {dt*1e3:.0f}ms -> {M/dt:.0f} pts/s", flush=True)
