"""Time the REAL insert_batch jit at bench shape (1M-cap state, M=8192),
with config ablations to locate the per-batch cost.

Synthetic state (random vectors/adjacency/codes) — per-batch cost depends
on shapes and convergence behavior, not data semantics, except that the
phase-2 while_loop convergence DOES depend on graph structure; random
adjacency converges differently from a real Vamana graph, so treat the
uncapped row as approximate and the capped rows (fixed iteration count)
as exact.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_insert.py
Env: PI_N (1_000_000), PI_M (8192), PI_ABLATIONS (json list of names)
"""

import json
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

N = int(os.environ.get("PI_N", 1_000_000))
M = int(os.environ.get("PI_M", 8192))
D, DP, R = 128, 64, 64
REPS = 2


def sync(x):
    # index the FIRST element without ravel/reshape: reshaping a multi-GB
    # array on TPU materializes a copy and OOMs
    np.asarray(x[(0,) * x.ndim])


def main():
    import dataclasses

    from diskann_tpu.graph import packed as pk
    from diskann_tpu.graph import state as st
    from diskann_tpu.graph.build import insert_batch
    from diskann_tpu.graph.config import GraphConfig
    from diskann_tpu.ops.distance import Metric

    base = GraphConfig(max_degree=R, l_build=100, alpha=1.2, beam_width=4)
    rs = base.max_degree_with_slack
    cap = ((N + M - 1) // M + 1) * M  # one spare batch row region

    LOG(f"[pi] backend={jax.default_backend()} N={N} M={M} cap={cap}")
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    state = st.alloc(cap, D, rs)
    vecs = jax.random.normal(key, (cap, D), jnp.float32)
    # slack slots beyond R are empty (-1) so backedge appends find room;
    # build by concatenation (an .at[].set on the full array would hold a
    # second 340MB transient)
    adj = jnp.concatenate([
        jax.random.randint(
            jax.random.fold_in(key, 1), (cap, R), 0, N, dtype=jnp.int32
        ),
        jnp.full((cap, rs - R), -1, jnp.int32),
    ], axis=1)
    state = state._replace(
        vectors=vecs,
        sq_norms=jnp.sum(vecs * vecs, axis=1),
        adjacency=adj,
        degrees=jnp.full((cap,), R, jnp.int32),
        valid=jnp.arange(cap) < N,
    )
    proj, pscale, pbias2 = pk.train_packed(
        rng.standard_normal((4096, D)).astype(np.float32), DP, Metric.L2
    )
    packed = pk.alloc_packed(proj, pscale, pbias2, cap, rs)
    packed = packed._replace(
        self_codes=jax.random.randint(
            jax.random.fold_in(key, 2), (cap, DP), -127, 128, dtype=jnp.int8
        ),
        self_aux=jax.random.uniform(
            jax.random.fold_in(key, 3), (cap,), jnp.float32, 0.0, 50.0
        ),
    )
    del vecs, adj
    sync(packed.rows)
    LOG("[pi] state ready")

    new_vecs = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    slot_ids = jnp.arange(N, N + M, dtype=jnp.int32)
    row_valid = jnp.ones((M,), jnp.bool_)
    start = jnp.zeros((1,), jnp.int32)

    mh24 = dataclasses.replace(base, build_max_hops=24)
    ablations = {
        "base": (base, {}),
        "mh32": (dataclasses.replace(base, build_max_hops=32), {}),
        "mh24": (mh24, {}),
        "mh16": (dataclasses.replace(base, build_max_hops=16), {}),
        "mh24_noib": (
            dataclasses.replace(mh24, intra_batch_candidates=0), {}),
        "noib": (dataclasses.replace(base, intra_batch_candidates=0), {}),
        "mh24_ib128": (
            dataclasses.replace(mh24, intra_batch_candidates=128), {}),
        "mh24_chunkM": (mh24, {"prune_chunk": M}),
        "mh24_chunk4k": (mh24, {"prune_chunk": 4096}),
        "mh24_bsc32": (mh24, {"backedge_src_cap": 32}),
        "mh24_be16": (
            dataclasses.replace(mh24, max_backedges=16), {}),
        "mh24_pool256": (mh24, {"pool_capacity": 256}),
        # occlusion-pool cap: the prune's [M, C] candidate-vector gather is
        # row-issue-bound, so cost ~ linear in C (reference cap 750 is a
        # worst-case bound, not a typical need)
        "mh24_occ384": (
            dataclasses.replace(mh24, max_occlusion_size=384), {}),
        "mh24_occ256": (
            dataclasses.replace(mh24, max_occlusion_size=256), {}),
        "mh24_occ256_p256": (
            dataclasses.replace(mh24, max_occlusion_size=256),
            {"pool_capacity": 256}),
    }
    # production bench shape: router-seeded searches converge by ~12 hops
    prod = dataclasses.replace(
        base, build_max_hops=12, max_occlusion_size=256)
    ablations.update({
        "prod": (prod, {}),
        "prod_noib": (
            dataclasses.replace(prod, intra_batch_candidates=0), {}),
        "prod_ib256": (
            dataclasses.replace(prod, intra_batch_candidates=256), {}),
        "prod_occ192": (
            dataclasses.replace(prod, max_occlusion_size=192), {}),
        "prod_occ128": (
            dataclasses.replace(prod, max_occlusion_size=128), {}),
        "prod_pool256": (prod, {"pool_capacity": 256}),
        "prod_be32": (
            dataclasses.replace(prod, max_backedges=32), {}),
        "prod_bsc32": (prod, {"backedge_src_cap": 32}),
        "prod_mh8": (
            dataclasses.replace(prod, build_max_hops=8), {}),
    })
    names = json.loads(os.environ.get(
        "PI_ABLATIONS", '["base","mh32","mh24","mh16","mh24_noib"]'
    ))

    results = {}
    for name in names:
        cfg, kw = ablations[name]
        t0 = time.time()
        s2, p2, stats = insert_batch(
            state, slot_ids, new_vecs, row_valid, start, cfg, packed, **kw
        )
        sync(stats.hops)
        compile_s = time.time() - t0
        # donation consumed state/packed; keep the returned ones and measure
        # steady-state by chaining (values drift but shapes/behavior don't)
        state, packed = s2, p2
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            state, packed, stats = insert_batch(
                state, slot_ids, new_vecs, row_valid, start, cfg, packed, **kw
            )
            sync(stats.hops)
            ts.append(time.time() - t0)
        hops = float(jnp.mean(stats.hops))
        ms = float(np.median(ts)) * 1e3
        results[name] = ms
        LOG(f"[pi] {name:12s} {ms:8.0f} ms/batch ({M/ms*1e3:6.0f} pts/s) "
            f"hops={hops:.1f} (first call {compile_s:.0f}s)")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
