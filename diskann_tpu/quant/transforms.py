"""Distance-preserving transforms: fast Walsh-Hadamard + randomized variants.

Reference: `diskann-quantization/src/algorithms/hadamard.rs` and
`src/algorithms/transforms/*` — the quantizer stack rotates vectors with a
Hadamard / padded-Hadamard / random rotation before coding so coordinate
energy is isotropic.

TPU form: the butterfly network is log2(d) elementwise stages (VPU adds, no
MXU), so a FWHT costs O(d log d) HBM-resident flops vs O(d^2) for a dense
rotation matmul — the right choice at large d.  At small d a materialized
matrix (`as_matrix`) feeds the same MXU matmul path the QR rotation uses.
The randomized form H*D (diagonal +-1 signs, `rounds` repetitions) is the
standard structured rotation; with `rounds>=2` it is isotropic enough to
replace a dense random rotation for quantizer training.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _next_pow2(d: int) -> int:
    p = 1
    while p < d:
        p <<= 1
    return p


@partial(jax.jit, static_argnames=("normalize",))
def fwht(x: jax.Array, *, normalize: bool = True) -> jax.Array:
    """Walsh-Hadamard transform along the last axis (power-of-2 length).

    Orthogonal (orthonormal when ``normalize``); self-inverse when
    normalized.  Rows come out in the natural (Sylvester) order's butterfly
    permutation — a fixed relabeling, irrelevant for rotation use."""
    d = x.shape[-1]
    if d & (d - 1):
        raise ValueError(f"fwht needs a power-of-2 dim, got {d}")
    shape = x.shape
    y = x.astype(jnp.float32).reshape(-1, d)
    h = 1
    while h < d:
        y = y.reshape(-1, d // (2 * h), 2, h)
        a = y[:, :, 0, :]
        b = y[:, :, 1, :]
        y = jnp.stack([a + b, a - b], axis=2)
        h *= 2
    y = y.reshape(shape)
    if normalize:
        y = y * (1.0 / jnp.sqrt(jnp.float32(d)))
    return y


class RandomizedHadamard(NamedTuple):
    """Padded randomized Hadamard rotation: x -> FWHT(D_r(...FWHT(D_1 pad(x)))).

    Maps [..., dim] -> [..., dim_pad] (zero-pad to the next power of 2,
    norms preserved exactly).  `signs` is [rounds, dim_pad] of +-1."""

    signs: jax.Array
    dim: int

    @property
    def dim_pad(self) -> int:
        return int(self.signs.shape[-1])

    def forward(self, x: jax.Array) -> jax.Array:
        x = jnp.asarray(x, jnp.float32)
        pad = self.dim_pad - self.dim
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        for r in range(self.signs.shape[0]):
            x = fwht(x * self.signs[r])
        return x

    def inverse(self, y: jax.Array) -> jax.Array:
        for r in range(self.signs.shape[0] - 1, -1, -1):
            y = fwht(y) * self.signs[r]
        return y[..., : self.dim]

    def as_matrix(self) -> jax.Array:
        """Materialize the equivalent [dim, dim_pad] rotation (orthonormal
        rows) for MXU-matmul consumers like the spherical quantizer."""
        eye = jnp.eye(self.dim, dtype=jnp.float32)
        return self.forward(eye)  # forward pads dim -> dim_pad


def train_randomized_hadamard(
    key: jax.Array, dim: int, *, rounds: int = 2
) -> RandomizedHadamard:
    """Sample the sign diagonals (reference double-Hadamard uses 2 rounds)."""
    dp = _next_pow2(dim)
    signs = jnp.where(
        jax.random.bernoulli(key, 0.5, (rounds, dp)), 1.0, -1.0
    ).astype(jnp.float32)
    return RandomizedHadamard(signs=signs, dim=dim)
