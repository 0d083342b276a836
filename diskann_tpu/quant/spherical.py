"""Spherical (RaBitQ-style) quantizer: rotation + unit-sphere codes.

Reference: `diskann-quantization/src/spherical/quantizer.rs:43` (train `:225`)
— vectors are rotated by a random distance-preserving transform
(`src/algorithms/hadamard.rs`, `transforms/*`), projected to the unit
sphere, and quantized at 1-8 bits/dim; the vector norm is stored separately
so distances reconstruct as ``|x| * <u_hat, q_rot>`` corrections.

TPU form: the rotation is a dense orthogonal matmul (MXU; a [d, d] matmul is
cheaper than a permuted FWHT at these dims), quantization is elementwise."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from diskann_tpu.ops.distance import squared_norms


class SphericalCodes(NamedTuple):
    codes: jax.Array    # [N, d] uintN stored as uint8
    norms: jax.Array    # [N] f32 original vector norms
    cscale: jax.Array   # [N] f32 per-vector code scale (max |u_i|)


class SphericalPackedCodes(NamedTuple):
    """Bit-sliced storage: 1/2/4-bit codes at their true memory footprint
    (the reference stores sub-byte spherical codes via BitSlice,
    `diskann-quantization/src/bits/slice.rs`)."""

    words: jax.Array    # [N, W] uint32 packed codes
    norms: jax.Array    # [N] f32
    cscale: jax.Array   # [N] f32
    dim: int
    n_bits: int


class SphericalQuantizer(NamedTuple):
    rotation: jax.Array  # [d, d] orthogonal
    n_bits: int = 8

    @property
    def levels(self) -> int:
        return (1 << int(self.n_bits)) - 1

    def encode(self, data) -> SphericalCodes:
        return _sph_encode(self.rotation, jnp.asarray(data), self.levels)

    def decode(self, sc: SphericalCodes) -> jax.Array:
        u = (sc.codes.astype(jnp.float32) / self.levels * 2.0 - 1.0) * sc.cscale[:, None]
        y = u * sc.norms[:, None]
        return y @ self.rotation.T

    def rotate_query(self, q) -> jax.Array:
        return jnp.asarray(q, jnp.float32) @ self.rotation

    def pack(self, sc: SphericalCodes) -> SphericalPackedCodes:
        from diskann_tpu.quant.bits import pack_bits

        return SphericalPackedCodes(
            words=pack_bits(sc.codes, int(self.n_bits)),
            norms=sc.norms,
            cscale=sc.cscale,
            dim=int(sc.codes.shape[-1]),
            n_bits=int(self.n_bits),
        )

    def unpack(self, pc: SphericalPackedCodes) -> SphericalCodes:
        from diskann_tpu.quant.bits import unpack_bits

        codes = unpack_bits(pc.words, pc.n_bits, pc.dim).astype(jnp.uint8)
        return SphericalCodes(codes=codes, norms=pc.norms, cscale=pc.cscale)

    def adc_l2(self, q, pc: SphericalPackedCodes) -> jax.Array:
        """Asymmetric squared-L2 against packed codes: [B, d] x [N, W] ->
        [B, N].  The code's affine decode (code -> (code/levels*2-1) *
        cscale * norm) folds into one raw-int dot (`bits.dot_packed`) plus
        per-row constants, so HBM reads only the packed words."""
        from diskann_tpu.quant.bits import dot_packed

        qr = self.rotate_query(q)                      # [B, d] rotated
        lv = float(self.levels)
        raw = dot_packed(qr, pc.words, pc.n_bits, pc.dim)   # [B, N] <q, code>
        qsum = qr.sum(axis=1, keepdims=True)                # [B, 1]
        # <q, y_hat> = norm*cscale * (2/levels * raw - qsum)
        dot_qy = pc.norms[None, :] * pc.cscale[None, :] * (
            (2.0 / lv) * raw - qsum
        )
        qsq = jnp.sum(qr * qr, axis=1, keepdims=True)
        # ||y_hat||^2 ~= norm^2 (codes live near the unit sphere)
        return qsq + (pc.norms**2)[None, :] - 2.0 * dot_qy


def train_spherical(key: jax.Array, dim: int, n_bits: int = 8,
                    rotation: str = "qr") -> SphericalQuantizer:
    """Random distance-preserving rotation.

    rotation="qr": dense orthogonal via QR of a gaussian matrix.
    rotation="hadamard": randomized padded double-Hadamard
    (`algorithms/hadamard.rs` / `transforms/*`), materialized to a
    [dim, dim_pad] matrix so encode/search stay on the MXU matmul path;
    codes get dim_pad (next pow2) dims."""
    if rotation == "hadamard":
        from diskann_tpu.quant.transforms import train_randomized_hadamard

        t = train_randomized_hadamard(key, dim)
        return SphericalQuantizer(rotation=t.as_matrix(), n_bits=n_bits)
    g = jax.random.normal(key, (dim, dim), jnp.float32)
    q, r = jnp.linalg.qr(g)
    # fix signs for a uniform rotation
    q = q * jnp.sign(jnp.diag(r))[None, :]
    return SphericalQuantizer(rotation=q, n_bits=n_bits)


@jax.jit
def _sph_encode(rotation, data, levels):
    y = data.astype(jnp.float32) @ rotation
    norms = jnp.sqrt(jnp.maximum(squared_norms(y), 1e-30))
    u = y / norms[:, None]
    cscale = jnp.maximum(jnp.abs(u).max(axis=1), 1e-12)
    t = (u / cscale[:, None] + 1.0) * 0.5 * levels
    codes = jnp.clip(jnp.round(t), 0, levels).astype(jnp.uint8)
    return SphericalCodes(codes=codes, norms=norms, cscale=cscale)
