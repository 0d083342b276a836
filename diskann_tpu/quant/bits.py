"""Bit-sliced packed codes: 1/2/4/8 bits per dimension in uint32 words.

Capability parity with the reference's `BitSlice` packed slices
(`diskann-quantization/src/bits/slice.rs`) and the SIMD distances over
packed codes (`src/bits/distances.rs:5-31`), re-designed for TPU:

- Packing/unpacking are elementwise shift/mask ops on uint32 lanes (VPU),
  always jit-fused into the surrounding computation — there is no scalar
  bit loop anywhere.
- Asymmetric (query f32 x packed code) distances unpack codes on the fly
  and run one dense contraction; XLA fuses unpack into the matmul operand
  so the HBM traffic is the *packed* bytes, which is the whole point
  (b/8 of the uint8 cost per dimension).
- Symmetric 1-bit distance is XOR + `population_count` (the VPOPCNTDQ
  analogue).

Layout: codes [N, d] with values < 2^b pack into words [N, ceil(d*b/32)]
uint32, dimension-major within a word (dim j sits at bit (j % (32/b)) * b
of word j // (32/b)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

VALID_BITS = (1, 2, 4, 8)


def words_per_row(dim: int, n_bits: int) -> int:
    per = 32 // n_bits
    return -(-dim // per)


@partial(jax.jit, static_argnames=("n_bits",))
def pack_bits(codes: jax.Array, n_bits: int) -> jax.Array:
    """[..., d] integer codes (< 2^n_bits) -> [..., W] uint32 words."""
    assert n_bits in VALID_BITS, n_bits
    d = codes.shape[-1]
    per = 32 // n_bits
    w = words_per_row(d, n_bits)
    c = codes.astype(jnp.uint32) & jnp.uint32((1 << n_bits) - 1)
    pad = w * per - d
    if pad:
        c = jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, pad)])
    c = c.reshape(c.shape[:-1] + (w, per))
    shifts = (jnp.arange(per, dtype=jnp.uint32) * n_bits)[
        (None,) * (c.ndim - 1) + (slice(None),)
    ]
    return (c << shifts).sum(axis=-1, dtype=jnp.uint32)


@partial(jax.jit, static_argnames=("n_bits", "dim"))
def unpack_bits(words: jax.Array, n_bits: int, dim: int) -> jax.Array:
    """[..., W] uint32 -> [..., dim] int32 codes."""
    assert n_bits in VALID_BITS, n_bits
    per = 32 // n_bits
    shifts = (jnp.arange(per, dtype=jnp.uint32) * n_bits)[
        (None,) * words.ndim + (slice(None),)
    ]
    mask = jnp.uint32((1 << n_bits) - 1)
    c = (words[..., None] >> shifts) & mask
    c = c.reshape(words.shape[:-1] + (words.shape[-1] * per,))
    return c[..., :dim].astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_bits", "dim"))
def dot_packed(q: jax.Array, words: jax.Array, n_bits: int, dim: int):
    """Asymmetric dot: f32 query rows x packed code rows.

    q: [B, dim] f32; words: [..., W] uint32 (any leading batch shape).
    Returns [B, ...] f32 of <q, codes> with codes as raw ints 0..2^b-1
    (callers apply their own affine decode: the spherical/scalar wrappers
    fold scale/offset into per-row constants, so raw-int dots suffice).
    """
    codes = unpack_bits(words, n_bits, dim).astype(jnp.float32)
    flat = codes.reshape((-1, dim))
    out = q @ flat.T
    return out.reshape((q.shape[0],) + words.shape[:-1])


@jax.jit
def hamming_packed(a: jax.Array, b: jax.Array) -> jax.Array:
    """Symmetric 1-bit distance: [M, W] x [N, W] -> [M, N] int32 popcounts."""
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jax.lax.population_count(x).sum(axis=-1).astype(jnp.int32)
