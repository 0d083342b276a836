"""Batched distance computation for all DiskANN metrics.

Distance *semantics* mirror the reference exactly (a "distance" is a
similarity score where smaller is better):

- ``L2``                : squared L2 (no sqrt) — reference ``SquaredL2``,
  `diskann-vector/src/distance/implementations.rs:215`.
- ``InnerProduct``      : negated dot product — `implementations.rs:301`.
- ``Cosine``            : ``1 - cos(x, y)`` — `implementations.rs:330`.
- ``CosineNormalized``  : ``1 - <x, y>`` assuming unit vectors —
  `implementations.rs:374`.
- ``L1``                : sum of absolute differences — reference
  ``L1NormFunctor``, `implementations.rs:413`.

The *formulation* is TPU-native: instead of one-pair-at-a-time SIMD loops
(`diskann-wide`), every distance is a dense matrix contraction that XLA tiles
onto the MXU.  Squared L2 uses the ``|x|^2 + |y|^2 - 2 x.y`` expansion so the
inner loop is a plain matmul; norms of the database side are precomputed once
and carried alongside the vectors (see ``GraphIndex`` / ``FlatIndex``).
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp


class Metric(enum.Enum):
    """Distance metric. Mirrors `diskann-vector/src/distance/metric.rs:11-20`."""

    L2 = "l2"
    InnerProduct = "ip"
    Cosine = "cosine"
    CosineNormalized = "cosine_normalized"
    L1 = "l1"

    @property
    def needs_norms(self) -> bool:
        """Whether the db-side squared norms are needed for the matmul form."""
        return self in (Metric.L2, Metric.Cosine)


def squared_norms(x: jax.Array) -> jax.Array:
    """Row-wise squared L2 norms, computed in f32. x: [..., d] -> [...]."""
    xf = x.astype(jnp.float32)
    return jnp.sum(xf * xf, axis=-1)


def preprocess_for_metric(x: jax.Array, metric: Metric) -> jax.Array:
    """Metric-specific data preprocessing.

    For ``CosineNormalized`` the reference assumes inputs are already unit
    vectors; callers may use this helper to normalize on ingestion.  For other
    metrics this is the identity.
    """
    if metric == Metric.CosineNormalized:
        n = jnp.sqrt(squared_norms(x))[..., None]
        return (x.astype(jnp.float32) / jnp.maximum(n, 1e-30)).astype(x.dtype)
    return x


def _dots(q: jax.Array, x: jax.Array) -> jax.Array:
    """Batched dot products on the MXU.

    q: [B, d], x: [B, C, d] or [N, d]  ->  [B, C] / [B, N] in f32.

    Precision=HIGHEST is load-bearing: on TPU an f32 matmul truncates its
    INPUTS to bf16 by default (`preferred_element_type` only widens the
    accumulator), and bf16's 8-bit mantissa mis-ranks near-tied neighbors
    — measured on 250k clustered data, ~1.9% of exact-groundtruth entries
    came back wrong, capping every recall curve at 0.983.  The reference
    computes full-f32 SIMD distances; exactness here is required for
    groundtruth, rerank, and prune parity.
    """
    qf = q.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    if x.ndim == 3:
        return jax.lax.dot_general(
            qf, xf,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return jax.lax.dot_general(
        qf, xf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def distance_to_set(
    q: jax.Array,
    x: jax.Array,
    metric: Metric,
    *,
    x_sq_norms: jax.Array | None = None,
    q_sq_norms: jax.Array | None = None,
) -> jax.Array:
    """Distances from queries to candidate sets, in reference semantics.

    q: [B, d] queries.
    x: [B, C, d] per-query candidates, or [N, d] a shared database.
    x_sq_norms: optional precomputed squared norms of x ([B, C] or [N]).
    q_sq_norms: optional precomputed squared norms of q ([B]).

    Returns [B, C] (or [B, N]) f32 distances (smaller = closer).
    """
    if metric == Metric.L1:
        # No matmul form exists for L1 — it is an elementwise abs-diff
        # reduction on the VPU.  [B, C, d] candidate blocks (the search
        # scorer shape) reduce in-register; a shared [N, d] database
        # broadcasts to [B, N, d], so flat scans should block over N.
        qf = q.astype(jnp.float32)
        xf = x.astype(jnp.float32)
        if x.ndim == 3:
            return jnp.sum(jnp.abs(qf[:, None, :] - xf), axis=-1)
        return jnp.sum(jnp.abs(qf[:, None, :] - xf[None, :, :]), axis=-1)
    dots = _dots(q, x)
    if metric == Metric.InnerProduct:
        return -dots
    if metric == Metric.CosineNormalized:
        return 1.0 - dots

    if x_sq_norms is None:
        x_sq_norms = squared_norms(x)
    if x.ndim == 2:
        x_sq_norms = x_sq_norms[None, :]
    if q_sq_norms is None:
        q_sq_norms = squared_norms(q)
    qn = q_sq_norms[:, None]

    if metric == Metric.L2:
        # max(0, .) guards tiny negatives from reordered f32 reductions.
        return jnp.maximum(qn + x_sq_norms - 2.0 * dots, 0.0)
    if metric == Metric.Cosine:
        denom = jnp.sqrt(jnp.maximum(qn * x_sq_norms, 1e-60))
        return 1.0 - dots / denom
    raise ValueError(f"unknown metric {metric}")


@partial(jax.jit, static_argnames=("metric",))
def pairwise_distance(
    a: jax.Array,
    b: jax.Array,
    metric: Metric = Metric.L2,
) -> jax.Array:
    """Full pairwise distance matrix.

    a: [M, d] or [B, M, d];  b: [N, d] or [B, N, d] (batch dims must match).
    Returns [M, N] (or [B, M, N]) f32.
    """
    if a.ndim == 2 and b.ndim == 2:
        return distance_to_set(a, b, metric)
    if a.ndim == 3 and b.ndim == 3:
        return jax.vmap(lambda aa, bb: distance_to_set(aa, bb, metric))(a, b)
    raise ValueError(f"rank mismatch: {a.shape} vs {b.shape}")
