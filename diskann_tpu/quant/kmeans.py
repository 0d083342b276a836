"""K-means on device: Lloyd's iterations as matmul + argmin + segment means.

Reference: `diskann-quantization/src/algorithms/kmeans/{lloyds.rs:441,
plusplus.rs:500}` — there it is rayon-parallel scalar code; here each
iteration is one [N, K] distance matrix (MXU), an argmin, and a one-hot
matmul for the centroid update.  k-means++ seeding runs K sequential
categorical draws over the running min-distance array (same semantics).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from diskann_tpu.ops.distance import Metric, distance_to_set, squared_norms


@partial(jax.jit, static_argnames=("k",))
def kmeans_pp_init(key: jax.Array, data: jax.Array, k: int) -> jax.Array:
    """k-means++ seeding (`plusplus.rs`): each next center drawn with
    probability proportional to squared distance to the nearest chosen one."""
    n, d = data.shape
    data = data.astype(jnp.float32)
    sq = squared_norms(data)

    key, sub = jax.random.split(key)
    first = jax.random.randint(sub, (), 0, n)
    centers = jnp.zeros((k, d), jnp.float32).at[0].set(data[first])

    def center_dist(c):
        # squared L2 of every point to center c
        return jnp.maximum(sq - 2.0 * (data @ c) + jnp.sum(c * c), 0.0)

    min_d = center_dist(data[first])

    def body(i, carry):
        centers, min_d, key = carry
        key, sub = jax.random.split(key)
        # categorical by log-prob; guard all-zero with uniform fallback
        logits = jnp.log(jnp.maximum(min_d, 1e-30))
        idx = jax.random.categorical(sub, logits)
        c = data[idx]
        centers = centers.at[i].set(c)
        min_d = jnp.minimum(min_d, center_dist(c))
        return centers, min_d, key

    centers, _, _ = jax.lax.fori_loop(1, k, body, (centers, min_d, key))
    return centers


@partial(jax.jit, static_argnames=("iters",))
def lloyd(data: jax.Array, centroids: jax.Array, iters: int = 10):
    """Lloyd's iterations (`lloyds.rs:441`). Empty clusters keep their previous
    centroid (the reference re-seeds; stability is equivalent for our use).

    Returns (centroids [K, d], assignments [N])."""
    data = data.astype(jnp.float32)
    n, d = data.shape
    k = centroids.shape[0]
    sq = squared_norms(data)

    def step(_, cent):
        dist = distance_to_set(data, cent, Metric.L2, q_sq_norms=sq)  # [N, K]
        assign = jnp.argmin(dist, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)         # [N, K]
        counts = onehot.sum(axis=0)                                    # [K]
        sums = jnp.einsum(
            "nk,nd->kd", onehot, data, preferred_element_type=jnp.float32
        )
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1)[:, None], cent)
        return new

    centroids = jax.lax.fori_loop(0, iters, step, centroids.astype(jnp.float32))
    dist = distance_to_set(data, centroids, Metric.L2, q_sq_norms=sq)
    return centroids, jnp.argmin(dist, axis=1).astype(jnp.int32)


def kmeans(
    key: jax.Array,
    data,
    k: int,
    *,
    iters: int = 10,
    max_train_points: int = 1 << 17,
):
    """Full pipeline: subsample -> k-means++ -> Lloyd. Returns (centroids,
    assignments-of-training-subset)."""
    data = jnp.asarray(data)
    n = data.shape[0]
    if n > max_train_points:
        key, sub = jax.random.split(key)
        sel = jax.random.choice(sub, n, (max_train_points,), replace=False)
        train = data[sel]
    else:
        train = data
    init = kmeans_pp_init(key, train, k)
    return lloyd(train, init, iters)
