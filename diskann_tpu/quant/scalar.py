"""Scalar quantizer: per-dimension affine int8/int4-style compression.

Reference: `diskann-quantization/src/scalar/quantizer.rs:86` — trains a
per-dimension range with sigma clipping (the "SQ_1_2.0" config string means
1 byte per dim, clip at 2.0 sigma — `diskann-disk/.../quantization_types.rs`)
and stores compensated vectors so IP/L2 can be computed in the integer
domain.  Here codes are stored int8 and the scorer dequantizes on gather
(halving/quartering HBM traffic vs f32 — the same reason the reference
quantizes: SSD/RAM footprint)."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ScalarQuantizer(NamedTuple):
    """codes = round((x - bias) / scale) per dimension, clipped to n_bits."""

    scale: jax.Array   # [d] f32
    bias: jax.Array    # [d] f32
    n_bits: int

    @property
    def levels(self) -> int:
        return (1 << self.n_bits) - 1

    def encode(self, data) -> jax.Array:
        return _sq_encode(self, jnp.asarray(data))

    def decode(self, codes) -> jax.Array:
        return codes.astype(jnp.float32) * self.scale[None, :] + self.bias[None, :]


@jax.jit
def _sq_encode(sq: ScalarQuantizer, data):
    x = (data.astype(jnp.float32) - sq.bias[None, :]) / sq.scale[None, :]
    x = jnp.clip(jnp.round(x), 0, sq.levels)
    return x.astype(jnp.uint8)


def train_scalar(
    data,
    *,
    n_bits: int = 8,
    sigma: float = 2.0,
) -> ScalarQuantizer:
    """Train per-dim range as mean +/- sigma*std (sigma clipping as in the
    reference's SQ_<bytes>_<sigma> configs)."""
    data = jnp.asarray(data, jnp.float32)
    mean = data.mean(axis=0)
    std = data.std(axis=0)
    lo = mean - sigma * std
    hi = mean + sigma * std
    levels = (1 << n_bits) - 1
    scale = jnp.maximum(hi - lo, 1e-12) / levels
    return ScalarQuantizer(scale=scale, bias=lo, n_bits=n_bits)
