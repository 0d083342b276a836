"""Binary quantizer: sign bits + Hamming distance via popcount.

Reference: `diskann-quantization/src/binary/quantizer.rs` and the packed
`BitSlice` distances (`src/bits/distances.rs:5-31`).  Codes pack 32
dimensions per uint32 word; Hamming distance is XOR +
`jax.lax.population_count` summed over words (the VPU analogue of AVX512
VPOPCNTDQ in the reference)."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class BinaryQuantizer(NamedTuple):
    dim: int

    @property
    def words(self) -> int:
        return -(-self.dim // 32)

    def encode(self, data) -> jax.Array:
        """[N, d] -> [N, words] uint32 sign bits (bit set where x >= 0)."""
        return _bin_encode(jnp.asarray(data), self.dim, self.words)

    def hamming(self, a_codes, b_codes) -> jax.Array:
        """Pairwise Hamming distances: [M, W] x [N, W] -> [M, N] i32."""
        x = jnp.bitwise_xor(a_codes[:, None, :], b_codes[None, :, :])
        return jax.lax.population_count(x).sum(axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("dim", "words"))
def _bin_encode(data, dim, words):
    n = data.shape[0]
    bits = (data[:, :dim] >= 0).astype(jnp.uint32)
    pad = words * 32 - dim
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    bits = bits.reshape(n, words, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return (bits << shifts).sum(axis=-1, dtype=jnp.uint32)
