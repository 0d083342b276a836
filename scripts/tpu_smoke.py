"""Real-TPU perf smoke test for beam search + insert batch.

Run with ambient env (JAX_PLATFORMS=axon -> the tunneled v5e chip):
    python scripts/tpu_smoke.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from diskann_tpu.graph.config import GraphConfig
from diskann_tpu.graph.search import beam_search
from diskann_tpu.graph.build import insert_batch
from diskann_tpu.graph import state as graph_state
from diskann_tpu.ops.distance import Metric, squared_norms


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    n, d, r = 1_000_000, 128, 64
    b, l = 1024, 100

    t0 = time.time()
    vectors = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    # plausible graph: random neighbors (structure doesn't matter for FLOP/s)
    adjacency = jnp.asarray(rng.integers(0, n, size=(n, r)).astype(np.int32))
    queries = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    sq = squared_norms(vectors)
    sq.block_until_ready()
    print(f"data upload: {time.time()-t0:.2f}s")

    start = jnp.zeros((1,), jnp.int32)
    t0 = time.time()
    res = beam_search(
        vectors, sq, adjacency, start, queries,
        metric=Metric.L2, l_search=l, beam_width=1, max_hops=160,
    )
    res.ids.block_until_ready()
    print(f"search compile+run: {time.time()-t0:.2f}s")

    for trial in range(3):
        t0 = time.time()
        res = beam_search(
            vectors, sq, adjacency, start, queries,
            metric=Metric.L2, l_search=l, beam_width=1, max_hops=160,
        )
        res.ids.block_until_ready()
        dt = time.time() - t0
        hops = float(np.asarray(res.hops).mean())
        print(
            f"search b={b} l={l}: {dt*1e3:.1f}ms -> {b/dt:.0f} QPS"
            f" (hops mean {hops:.1f})"
        )

    # ---- insert batch ----
    cfg = GraphConfig(max_degree=64, l_build=100)
    st = graph_state.alloc(n, d, cfg.max_degree_with_slack)
    # seed: pretend 500k points already there with the random graph
    st = graph_state.set_vectors(st, 0, vectors[:500_000])
    st = st._replace(
        adjacency=st.adjacency.at[:500_000, :r].set(
            jnp.asarray(rng.integers(0, 500_000, size=(500_000, r)).astype(np.int32))
        ),
        degrees=st.degrees.at[:500_000].set(r),
    )
    newv = jnp.asarray(rng.standard_normal((1024, d)).astype(np.float32))
    rv = jnp.ones((1024,), bool)
    slots = 500_000 + jnp.arange(1024, dtype=jnp.int32)
    t0 = time.time()
    st2, _pk, stats = insert_batch(st, slots, newv, rv, start, cfg)
    _ = np.asarray(st2.degrees[:1])
    print(f"insert compile+run: {time.time()-t0:.2f}s")
    for trial in range(3):
        t0 = time.time()
        st2, _pk, stats = insert_batch(st, slots, newv, rv, start, cfg)
        _ = np.asarray(st2.degrees[:1])
        dt = time.time() - t0
        print(f"insert batch 1024: {dt*1e3:.1f}ms -> {1024/dt:.0f} pts/s")


if __name__ == "__main__":
    main()
