"""MinMax quantizer: per-vector, training-free uniform quantization.

Reference: `diskann-quantization/src/minmax/quantizer.rs:69` — each vector
stores its own (min, max) and 8-bit codes over that range; no training pass
is needed, which is why the reference uses it for streaming workloads."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MinMaxQuantizer(NamedTuple):
    n_bits: int = 8

    @property
    def levels(self) -> int:
        return (1 << self.n_bits) - 1

    def encode(self, data):
        """Returns (codes [N, d] uint8, lo [N] f32, step [N] f32)."""
        return _mm_encode(jnp.asarray(data), self.levels)

    def decode(self, codes, lo, step):
        return codes.astype(jnp.float32) * step[:, None] + lo[:, None]


@jax.jit
def _mm_encode(data, levels):
    x = data.astype(jnp.float32)
    lo = x.min(axis=1)
    hi = x.max(axis=1)
    step = jnp.maximum(hi - lo, 1e-12) / levels
    codes = jnp.clip(jnp.round((x - lo[:, None]) / step[:, None]), 0, levels)
    return codes.astype(jnp.uint8), lo, step
