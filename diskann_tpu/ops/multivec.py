"""Multi-vector (ColBERT-style) Chamfer / MaxSim distances.

Reference: `diskann-quantization/src/multi_vector/mod.rs:6-18` (Chamfer and
MaxSim over per-token embedding matrices, with a blocked-transposed layout
for SIMD).  On TPU the token-level similarity matrix for a whole batch of
query sets against a block of document sets is ONE einsum on the MXU,
followed by max/sum reductions — no special layout needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("metric",))
def chamfer_scores(
    q_tokens: jax.Array,   # [B, tq, d] (zero-padded tokens allowed)
    q_mask: jax.Array,     # [B, tq] bool
    x_tokens: jax.Array,   # [N, tx, d]
    x_mask: jax.Array,     # [N, tx] bool
    metric: str = "maxsim",
) -> jax.Array:
    """[B, N] multi-vector distances (smaller = closer).

    metric="maxsim":  -sum_i max_j <q_i, x_j>      (inner-product Chamfer)
    metric="chamfer_l2": sum_i min_j ||q_i - x_j||^2
    """
    sims = jnp.einsum(
        "bqd,nxd->bnqx", q_tokens.astype(jnp.float32),
        x_tokens.astype(jnp.float32), preferred_element_type=jnp.float32,
    )
    xm = x_mask[None, :, None, :]
    if metric == "maxsim":
        sims = jnp.where(xm, sims, -jnp.inf)
        best = jnp.max(sims, axis=-1)                         # [B, N, tq]
        best = jnp.where(q_mask[:, None, :], best, 0.0)
        return -jnp.sum(best, axis=-1)
    if metric == "chamfer_l2":
        qsq = jnp.sum(q_tokens.astype(jnp.float32) ** 2, axis=-1)  # [B, tq]
        xsq = jnp.sum(x_tokens.astype(jnp.float32) ** 2, axis=-1)  # [N, tx]
        d2 = qsq[:, None, :, None] + xsq[None, :, None, :] - 2.0 * sims
        d2 = jnp.where(xm, d2, jnp.inf)
        best = jnp.min(d2, axis=-1)
        best = jnp.where(q_mask[:, None, :], best, 0.0)
        return jnp.sum(best, axis=-1)
    raise ValueError(metric)


class FlatMultiVectorIndex:
    """Brute-force multi-vector index (token sets per document).

    Documents are ragged; they are stored padded to the max token count with
    masks (the reference's block-transposed layout serves its SIMD kernels,
    `multi_vector/block_transposed.rs` — padding serves the MXU here)."""

    def __init__(self, docs: list[np.ndarray], metric: str = "maxsim"):
        self.n = len(docs)
        self.metric = metric
        tx = max(d.shape[0] for d in docs)
        dim = docs[0].shape[1]
        toks = np.zeros((self.n, tx, dim), np.float32)
        mask = np.zeros((self.n, tx), bool)
        for i, dd in enumerate(docs):
            toks[i, : dd.shape[0]] = dd
            mask[i, : dd.shape[0]] = True
        self.tokens = jnp.asarray(toks)
        self.mask = jnp.asarray(mask)

    def search(self, queries: list[np.ndarray], k: int = 10, *, chunk: int = 4096):
        tq = max(q.shape[0] for q in queries)
        dim = queries[0].shape[1]
        b = len(queries)
        qt = np.zeros((b, tq, dim), np.float32)
        qm = np.zeros((b, tq), bool)
        for i, qq in enumerate(queries):
            qt[i, : qq.shape[0]] = qq
            qm[i, : qq.shape[0]] = True
        qt, qm = jnp.asarray(qt), jnp.asarray(qm)

        best_d = np.full((b, k), np.inf, np.float32)
        best_i = np.full((b, k), -1, np.int64)
        all_d = []
        for off in range(0, self.n, chunk):
            scores = chamfer_scores(
                qt, qm, self.tokens[off : off + chunk],
                self.mask[off : off + chunk], self.metric,
            )
            all_d.append(np.asarray(scores))
        d = np.concatenate(all_d, axis=1)
        order = np.argsort(d, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(d, order, axis=1), order
