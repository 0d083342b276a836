"""Product quantization: codebook training, encoding, ADC search support.

Reference: PQ training `diskann-quantization/src/product/train.rs:22-40`
(k-means pivots per chunk) and the runtime ADC table
`diskann-providers/src/model/pq/fixed_chunk_pq_table.rs:27` — there the
query builds one 256-entry distance table per chunk and each candidate code
gathers+sums; here training vmaps k-means over chunks and the ADC scan lives
in `diskann_tpu.graph.scorers.pq_scorer` as batched table gathers.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from diskann_tpu.ops.distance import Metric, distance_to_set
from diskann_tpu.quant.kmeans import kmeans_pp_init, lloyd


class PQ(NamedTuple):
    """Trained product quantizer. pivots: [m, k, ds] f32."""

    pivots: jax.Array
    dim: int          # original dimensionality (before chunk padding)

    @property
    def n_chunks(self) -> int:
        return self.pivots.shape[0]

    @property
    def n_centers(self) -> int:
        return self.pivots.shape[1]

    @property
    def chunk_dim(self) -> int:
        return self.pivots.shape[2]

    # -------------------------------------------------------------- encode
    def encode(self, data, *, batch: int = 1 << 16) -> jax.Array:
        """Encode vectors to [N, m] uint8 codes (argmin per chunk)."""
        data = np.asarray(data, np.float32)
        n = data.shape[0]
        out = np.empty((n, self.n_chunks), np.uint8)
        for off in range(0, n, batch):
            chunk = jnp.asarray(data[off : off + batch])
            out[off : off + batch] = np.asarray(_encode_batch(self.pivots, chunk, self.dim))
        return jnp.asarray(out)

    def decode(self, codes) -> jax.Array:
        """Reconstruct [N, dim] from codes."""
        codes = jnp.asarray(codes).astype(jnp.int32)
        m, k, ds = self.pivots.shape
        rec = jnp.take_along_axis(
            self.pivots[None], codes[:, :, None, None], axis=2
        )[:, :, 0, :]                       # [N, m, ds]
        return rec.reshape(codes.shape[0], m * ds)[:, : self.dim]


def _pad_to_chunks(data: jax.Array, m: int, ds: int) -> jax.Array:
    n, d = data.shape
    pad = m * ds - d
    if pad:
        data = jnp.pad(data, ((0, 0), (0, pad)))
    return data.reshape(n, m, ds)


@partial(jax.jit, static_argnames=("dim",))
def _encode_batch(pivots, data, dim):
    m, k, ds = pivots.shape
    x = _pad_to_chunks(data.astype(jnp.float32), m, ds)      # [N, m, ds]

    def per_chunk(xc, pc):
        d = distance_to_set(xc, pc, Metric.L2)
        return jnp.argmin(d, axis=1)

    codes = jax.vmap(per_chunk, in_axes=(1, 0), out_axes=1)(x, pivots)
    return codes.astype(jnp.uint8)


def train_pq(
    key: jax.Array,
    data,
    n_chunks: int = 8,
    n_centers: int = 256,
    *,
    iters: int = 12,
    max_train_points: int = 1 << 16,
) -> PQ:
    """Train PQ codebooks: k-means per chunk, vmapped across chunks
    (replaces the rayon loop in `train.rs`)."""
    data = jnp.asarray(data, jnp.float32)
    n, d = data.shape
    if n > max_train_points:
        key, sub = jax.random.split(key)
        sel = jax.random.choice(sub, n, (max_train_points,), replace=False)
        data = data[sel]
        n = max_train_points
    ds = -(-d // n_chunks)
    x = _pad_to_chunks(data, n_chunks, ds)                  # [N, m, ds]

    keys = jax.random.split(key, n_chunks)

    def train_chunk(k_, xc):
        init = kmeans_pp_init(k_, xc, n_centers)
        cent, _ = lloyd(xc, init, iters)
        return cent

    pivots = jax.vmap(train_chunk, in_axes=(0, 1))(keys, x)  # [m, k, ds]
    return PQ(pivots=pivots, dim=d)
