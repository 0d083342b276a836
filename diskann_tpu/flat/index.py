"""FlatIndex: exact brute-force top-k scan.

Replaces the reference's `FlatIndex` (`diskann/src/flat/mod.rs`) and the
groundtruth CLI (`diskann-tools/src/bin/compute_groundtruth.rs`).  On TPU the
scan is a single (queries x database) distance matmul tiled over database
chunks so arbitrarily large databases stream through HBM with a running top-k.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from diskann_tpu.ops.distance import Metric, distance_to_set, squared_norms
from diskann_tpu.ops.topk import merge_sorted


@partial(jax.jit, static_argnames=("chunk", "n"))
def _sq_norms_chunked(x, *, chunk: int, n: int):
    """Row norms of a huge array without materializing the square.

    Eager ``squared_norms`` on an N x d array dispatches the elementwise
    square as its own XLA program, so the [N, d] product materializes in
    HBM next to the input — at 20M x 128 f32 that is 2 x 9.5GB + output and
    OOMs the chip.  Inside one jit the slice -> square -> reduce chain fuses
    per chunk, so peak extra HBM is one [chunk, d] tile.  The tail chunk
    clamps its start (same trick as ``_flat_search``); overlapped rows just
    recompute identical norms.
    """
    out = jnp.zeros((n,), jnp.float32)
    num_chunks = (n + chunk - 1) // chunk

    def body(c, out):
        start = jnp.minimum(c * chunk, n - chunk)
        v = jax.lax.dynamic_slice_in_dim(x, start, chunk, axis=0)
        vf = v.astype(jnp.float32)
        return jax.lax.dynamic_update_slice(
            out, jnp.sum(vf * vf, axis=-1), (start,)
        )

    return jax.lax.fori_loop(0, num_chunks, body, out)


@partial(jax.jit, static_argnames=("metric", "k", "chunk", "n"))
def _flat_search(queries, vectors, sq_norms, *, metric: Metric, k: int, chunk: int, n: int):
    b = queries.shape[0]
    q_sq = squared_norms(queries) if metric.needs_norms else None

    num_chunks = (n + chunk - 1) // chunk
    best_d = jnp.full((b, k), jnp.inf, dtype=jnp.float32)
    best_i = jnp.full((b, k), -1, dtype=jnp.int32)

    def body(c, carry):
        best_d, best_i = carry
        # the tail chunk CLAMPS its start instead of padding the database —
        # padding would copy the whole (possibly 10GB+) array; rows the
        # clamped window re-reads were covered by the previous chunk and
        # are masked out so no id can enter the top-k twice
        start_u = c * chunk
        start = jnp.minimum(start_u, n - chunk)
        v = jax.lax.dynamic_slice_in_dim(vectors, start, chunk, axis=0)
        vn = jax.lax.dynamic_slice_in_dim(sq_norms, start, chunk, axis=0)
        d = distance_to_set(queries, v, metric, x_sq_norms=vn, q_sq_norms=q_sq)
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        d = jnp.where(ids >= start_u, d, jnp.inf)
        best_d, best_i = merge_sorted(best_d, best_i, d, ids, k)
        return best_d, best_i

    return jax.lax.fori_loop(0, num_chunks, body, (best_d, best_i))


class FlatIndex:
    """Exact top-k index over an in-HBM (or chunk-streamed) database."""

    def __init__(self, vectors, metric: Metric = Metric.L2):
        vectors = jnp.asarray(vectors)
        self.n, self.dim = vectors.shape
        self.metric = metric
        # Pad N to the chunk multiple lazily in search; keep raw array here.
        self.vectors = vectors
        if not metric.needs_norms:
            self.sq_norms = jnp.zeros((self.n,), jnp.float32)
        elif self.n * self.dim > (1 << 27):
            self.sq_norms = _sq_norms_chunked(
                vectors, chunk=min(1 << 20, self.n), n=self.n
            )
        else:
            self.sq_norms = squared_norms(vectors)

    def search(self, queries, k: int, *, chunk: int | None = None):
        """Exact k-NN. queries: [B, d]. Returns (dists [B,k], ids [B,k]) numpy."""
        queries = jnp.asarray(queries)
        if chunk is None:
            # ~256MB of distance matrix per chunk at B=10k.
            chunk = min(max(8192, 1 << 14), max(self.n, 128))
            if self.metric == Metric.L1:
                # L1 has no matmul form; the abs-diff fusion is [B, chunk, d]
                # shaped, so keep chunks small enough to stay in VMEM tiles
                chunk = min(2048, chunk)
        chunk = min(chunk, self.n)
        d, i = _flat_search(
            queries, self.vectors, self.sq_norms,
            metric=self.metric, k=k, chunk=chunk, n=self.n,
        )
        return np.asarray(d), np.asarray(i)
