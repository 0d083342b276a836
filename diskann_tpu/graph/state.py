"""Device-resident graph index state.

The reference stores vectors/adjacency behind a `DataProvider` (slot stores,
epoch reclamation, per-node locks — `diskann-inmem/src/{store,epoch,neighbors}.rs`).
On TPU the equivalent is a *functional* state pytree of fixed-capacity dense
arrays updated by batched pure kernels — versioned buffers instead of EBR:

- ``vectors  [cap, d]``  vector data (dtype configurable),
- ``sq_norms [cap]``     precomputed squared norms (L2/cosine matmul form),
- ``adjacency[cap, R_slack] i32``  fixed-degree padded graph, -1 = empty,
- ``degrees  [cap] i32`` live out-degree per node,
- ``valid    [cap] bool`` liveness bitmap (False = deleted / never written).

Capacity is static for XLA; the facade grows it by reallocating (amortized,
like the reference's slot store growth).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from diskann_tpu.ops.distance import squared_norms


class GraphArrays(NamedTuple):
    vectors: jax.Array    # [cap, d]
    sq_norms: jax.Array   # [cap] f32
    adjacency: jax.Array  # [cap, R_slack] i32
    degrees: jax.Array    # [cap] i32
    valid: jax.Array      # [cap] bool
    vec_sum: jax.Array    # [d] f32 running sum of live vectors (medoid upkeep)

    @property
    def capacity(self) -> int:
        # adjacency, not vectors: the tiered flow drops the HBM vector copy
        # to a [1, d] stub, but the graph keeps full capacity
        return self.adjacency.shape[0]

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]

    @property
    def max_degree_slack(self) -> int:
        return self.adjacency.shape[1]


def alloc(capacity: int, dim: int, r_slack: int, dtype=jnp.float32) -> GraphArrays:
    return GraphArrays(
        vectors=jnp.zeros((capacity, dim), dtype=dtype),
        sq_norms=jnp.zeros((capacity,), jnp.float32),
        adjacency=jnp.full((capacity, r_slack), -1, jnp.int32),
        degrees=jnp.zeros((capacity,), jnp.int32),
        valid=jnp.zeros((capacity,), jnp.bool_),
        vec_sum=jnp.zeros((dim,), jnp.float32),
    )


def grow(state: GraphArrays, new_capacity: int) -> GraphArrays:
    cap = state.capacity
    assert new_capacity >= cap
    extra = new_capacity - cap
    return GraphArrays(
        vectors=jnp.pad(state.vectors, ((0, extra), (0, 0))),
        sq_norms=jnp.pad(state.sq_norms, (0, extra)),
        adjacency=jnp.pad(state.adjacency, ((0, extra), (0, 0)), constant_values=-1),
        degrees=jnp.pad(state.degrees, (0, extra)),
        valid=jnp.pad(state.valid, (0, extra)),
        vec_sum=state.vec_sum,
    )


def set_vectors(state: GraphArrays, slot_ids, vecs, row_valid=None) -> GraphArrays:
    """Write a batch of vectors at ``slot_ids`` (phase 1 of multi_insert:
    `index.rs:482-534` "Set Elements").  Slots may be non-contiguous — this
    is how freelist reuse works after deletes (the analogue of the slot
    store + freelist in `diskann-inmem/src/{store,freelist}.rs`).

    ``row_valid`` masks ragged/padded batch rows: masked rows are dropped.
    """
    vecs = vecs.astype(state.vectors.dtype)
    m = vecs.shape[0]
    cap = state.capacity
    if row_valid is None:
        row_valid = jnp.ones((m,), jnp.bool_)
    vecs = jnp.where(row_valid[:, None], vecs, 0)
    sq = squared_norms(vecs)
    w = jnp.where(row_valid, slot_ids, cap)
    return state._replace(
        vectors=state.vectors.at[w].set(vecs, mode="drop"),
        sq_norms=state.sq_norms.at[w].set(sq, mode="drop"),
        valid=state.valid.at[w].set(True, mode="drop"),
        vec_sum=state.vec_sum + jnp.sum(vecs.astype(jnp.float32), axis=0),
    )


def medoid(state: GraphArrays, n) -> jax.Array:
    """Index of the live vector closest to the running mean.

    Replaces the reference's Medoid start-point strategy
    (`diskann/src/graph/start_point.rs:19-41`, `diskann-utils/src/sampling`):
    one matvec + argmin on device instead of a sampled host scan.
    """
    denom = jnp.maximum(n.astype(jnp.float32), 1.0)
    mean = state.vec_sum / denom
    dots = state.vectors.astype(jnp.float32) @ mean
    d2 = state.sq_norms - 2.0 * dots  # + |mean|^2 constant, irrelevant to argmin
    d2 = jnp.where(state.valid, d2, jnp.inf)
    return jnp.argmin(d2).astype(jnp.int32)


def start_ids(
    state: GraphArrays,
    n: int,
    strategy: str = "medoid",
    k: int = 1,
    seed: int = 0,
) -> jax.Array:
    """Entry-point ids for a graph walk — the reference's start-point
    strategy family (`diskann/src/graph/start_point.rs:19-41`), TPU-style:
    every strategy resolves to a small int32 id array computed with at most
    one device pass, usable directly as `beam_search` starts.

    - "medoid": live vector closest to the running mean (the default).
    - "first_vector": the first live id (FirstVector).
    - "random_samples": `k` random live ids (RandomSamples).
    - "latin_hypercube": the live id range cut into `k` strata, one random
      live id per stratum (LatinHyperCube — stratified coverage).
    - "random_vectors": `k` random Gaussian vectors, each mapped to its
      nearest live node with one matmul (RandomVectors; the reference
      seeds walks at random points in SPACE — on an id-based graph the
      nearest live node is that point's entry).
    """
    import numpy as np

    if strategy == "medoid":
        return medoid(state, jnp.int32(n))[None]

    valid = np.asarray(state.valid[:n])
    live = np.nonzero(valid)[0]
    if len(live) == 0:
        return jnp.full((max(k, 1),), -1, jnp.int32)
    rng = np.random.default_rng(seed)
    if strategy == "first_vector":
        sel = live[:1]
    elif strategy == "random_samples":
        sel = rng.choice(live, size=min(k, len(live)), replace=False)
    elif strategy == "latin_hypercube":
        strata = np.array_split(live, max(k, 1))
        sel = np.array(
            [rng.choice(s) for s in strata if len(s)], dtype=np.int64
        )
    elif strategy == "random_vectors":
        dim = state.vectors.shape[1]
        q = rng.standard_normal((max(k, 1), dim)).astype(np.float32)
        qd = jnp.asarray(q)
        d = (
            state.sq_norms[None, :n]
            - 2.0 * qd @ state.vectors[:n].astype(jnp.float32).T
        )
        d = jnp.where(jnp.asarray(valid)[None, :], d, jnp.inf)
        sel = np.asarray(jnp.argmin(d, axis=1))
    else:
        raise ValueError(f"unknown start strategy {strategy!r}")
    return jnp.asarray(np.unique(sel).astype(np.int32))
