"""Quantization stack tests: k-means convergence, PQ reconstruction + ADC
search, scalar/minmax/spherical/binary round trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diskann_tpu.ops.distance import Metric
from diskann_tpu.quant import (
    BinaryQuantizer,
    MinMaxQuantizer,
    PQ,
    kmeans,
    train_pq,
    train_scalar,
    train_spherical,
)
from diskann_tpu.graph.scorers import pq_scorer


def test_kmeans_recovers_clusters(rng):
    centers = rng.standard_normal((8, 4)).astype(np.float32) * 5
    x = np.concatenate(
        [c + 0.05 * rng.standard_normal((50, 4)).astype(np.float32) for c in centers]
    )
    cent, assign = kmeans(jax.random.key(0), x, 8, iters=15)
    cent = np.asarray(cent)
    # every true center has a learned centroid nearby
    d = ((centers[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    assert (d.min(axis=1) < 0.05).all()
    # points in the same true cluster share a label
    a = np.asarray(assign).reshape(8, 50)
    assert all(len(set(row.tolist())) == 1 for row in a)


def test_pq_reconstruction_error(rng):
    x = rng.standard_normal((2000, 32)).astype(np.float32)
    pq = train_pq(jax.random.key(1), x, n_chunks=8, n_centers=64, iters=8)
    codes = pq.encode(x)
    assert codes.shape == (2000, 8)
    rec = np.asarray(pq.decode(codes))
    rel = np.linalg.norm(rec - x) / np.linalg.norm(x)
    assert rel < 0.6, rel  # 64 centers x 8 chunks on random data
    # PQ of the training data must beat random codes by a wide margin
    rand_rec = np.asarray(pq.decode(rng.integers(0, 64, size=codes.shape)))
    rand_rel = np.linalg.norm(rand_rec - x) / np.linalg.norm(x)
    assert rel < 0.7 * rand_rel


def test_pq_adc_matches_decoded_distance(rng):
    """ADC (LUT) distances == distances to the decoded candidates."""
    x = rng.standard_normal((500, 16)).astype(np.float32)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    pq = train_pq(jax.random.key(2), x, n_chunks=4, n_centers=32, iters=6)
    codes = pq.encode(x)
    sdef, sdata = pq_scorer(codes, pq.pivots, Metric.L2)
    ids = jnp.asarray(rng.integers(0, 500, size=(4, 10)).astype(np.int32))
    q_ctx = sdef.prep(sdata, jnp.asarray(q))
    got = np.asarray(sdef.score(sdata, q_ctx, ids, jnp.ones((4, 10), bool)))
    rec = np.asarray(pq.decode(codes))
    for b in range(4):
        want = ((q[b][None] - rec[np.asarray(ids)[b]]) ** 2).sum(-1)
        np.testing.assert_allclose(got[b], want, rtol=2e-3, atol=2e-3)


def test_scalar_roundtrip(rng):
    x = rng.standard_normal((300, 24)).astype(np.float32)
    sq = train_scalar(x, n_bits=8, sigma=3.0)
    codes = sq.encode(x)
    assert codes.dtype == jnp.uint8
    rec = np.asarray(sq.decode(codes))
    err = np.abs(rec - np.clip(x, np.asarray(sq.bias), None)).max()
    # quantization error bounded by ~step size within the clipped range
    step = np.asarray(sq.scale).max()
    inside = np.abs(x - x.mean(0)) < 2.9 * x.std(0)
    assert np.abs((rec - x))[inside].max() <= step * 1.5


def test_minmax_roundtrip(rng):
    x = rng.standard_normal((100, 16)).astype(np.float32)
    mm = MinMaxQuantizer(n_bits=8)
    codes, lo, step = mm.encode(x)
    rec = np.asarray(mm.decode(codes, lo, step))
    assert np.abs(rec - x).max() <= np.asarray(step).max() * 0.51 + 1e-6


def test_spherical_preserves_distances(rng):
    x = rng.standard_normal((200, 32)).astype(np.float32)
    sph = train_spherical(jax.random.key(3), 32, n_bits=8)
    sc = sph.encode(x)
    rec = np.asarray(sph.decode(sc))
    rel = np.linalg.norm(rec - x) / np.linalg.norm(x)
    assert rel < 0.02, rel  # 8-bit spherical is near-lossless
    # rotation is orthogonal
    r = np.asarray(sph.rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(32), atol=1e-4)


def test_fwht_orthonormal_self_inverse(rng):
    from diskann_tpu.quant.transforms import fwht

    x = rng.standard_normal((20, 64)).astype(np.float32)
    y = np.asarray(fwht(x))
    # orthonormal: norms and pairwise inner products preserved
    np.testing.assert_allclose(
        (y * y).sum(1), (x * x).sum(1), rtol=1e-5
    )
    np.testing.assert_allclose(y @ y.T, x @ x.T, atol=1e-3)
    # self-inverse (normalized)
    np.testing.assert_allclose(np.asarray(fwht(y)), x, atol=1e-5)


def test_randomized_hadamard_transform(rng):
    """Padded randomized Hadamard (`algorithms/hadamard.rs`,
    `transforms/*`): norm-preserving dim->next-pow2 map, exact inverse,
    and the materialized matrix matches the butterfly path."""
    from diskann_tpu.quant.transforms import train_randomized_hadamard

    t = train_randomized_hadamard(jax.random.key(0), 24)
    assert t.dim_pad == 32
    x = rng.standard_normal((50, 24)).astype(np.float32)
    y = np.asarray(t.forward(x))
    assert y.shape == (50, 32)
    np.testing.assert_allclose((y * y).sum(1), (x * x).sum(1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t.inverse(y)), x, atol=1e-5)
    m = np.asarray(t.as_matrix())
    np.testing.assert_allclose(m @ m.T, np.eye(24), atol=1e-4)
    np.testing.assert_allclose(x @ m, y, atol=1e-4)


def test_spherical_hadamard_rotation(rng):
    x = rng.standard_normal((200, 24)).astype(np.float32)
    sph = train_spherical(jax.random.key(3), 24, n_bits=8,
                          rotation="hadamard")
    assert sph.rotation.shape == (24, 32)  # padded to next pow2
    sc = sph.encode(x)
    rec = np.asarray(sph.decode(sc))
    rel = np.linalg.norm(rec - x) / np.linalg.norm(x)
    assert rel < 0.02, rel


def test_binary_hamming(rng):
    x = rng.standard_normal((50, 40)).astype(np.float32)
    bq = BinaryQuantizer(dim=40)
    codes = bq.encode(x)
    assert codes.shape == (50, 2)
    h = np.asarray(bq.hamming(codes, codes))
    # diagonal zero, symmetric, bounded by dim
    assert (np.diag(h) == 0).all()
    assert (h == h.T).all()
    assert h.max() <= 40
    # oracle check on a few pairs
    signs = x >= 0
    for i, j in [(0, 1), (3, 7), (10, 49)]:
        assert h[i, j] == (signs[i] != signs[j]).sum()


@pytest.mark.parametrize("n_bits", [1, 2, 4, 8])
def test_bits_pack_roundtrip(rng, n_bits):
    from diskann_tpu.quant.bits import pack_bits, unpack_bits, words_per_row

    d = 37  # deliberately not word-aligned
    codes = rng.integers(0, 1 << n_bits, size=(20, d)).astype(np.int32)
    words = pack_bits(jnp.asarray(codes), n_bits)
    assert words.shape == (20, words_per_row(d, n_bits))
    back = np.asarray(unpack_bits(words, n_bits, d))
    np.testing.assert_array_equal(back, codes)


@pytest.mark.parametrize("n_bits", [2, 4])
def test_bits_dot_packed_matches_unpacked(rng, n_bits):
    from diskann_tpu.quant.bits import dot_packed, pack_bits

    d = 24
    codes = rng.integers(0, 1 << n_bits, size=(15, d)).astype(np.int32)
    q = rng.standard_normal((6, d)).astype(np.float32)
    words = pack_bits(jnp.asarray(codes), n_bits)
    got = np.asarray(dot_packed(jnp.asarray(q), words, n_bits, d))
    want = q @ codes.T.astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_bits_hamming_matches_binary_quantizer(rng):
    from diskann_tpu.quant.bits import hamming_packed

    x = rng.standard_normal((30, 64)).astype(np.float32)
    bq = BinaryQuantizer(dim=64)
    codes = bq.encode(x)
    np.testing.assert_array_equal(
        np.asarray(hamming_packed(codes, codes)),
        np.asarray(bq.hamming(codes, codes)),
    )


@pytest.mark.parametrize("n_bits", [2, 4])
def test_spherical_packed_adc(rng, n_bits):
    """Packed sub-byte spherical ADC ranks neighbors like exact L2."""
    d = 32
    sph = train_spherical(jax.random.key(5), d, n_bits=n_bits)
    x = rng.standard_normal((200, d)).astype(np.float32)
    q = rng.standard_normal((4, d)).astype(np.float32)
    sc = sph.encode(x)
    pc = sph.pack(sc)
    # pack/unpack is lossless on the uint8 codes
    back = sph.unpack(pc)
    np.testing.assert_array_equal(np.asarray(back.codes), np.asarray(sc.codes))
    approx = np.asarray(sph.adc_l2(jnp.asarray(q), pc))    # [B, N]
    exact = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    # ADC distance approximates exact L2 against the DECODED vectors; check
    # top-10-by-approx overlaps top-10-by-exact substantially
    for b in range(4):
        top_a = set(np.argsort(approx[b])[:10].tolist())
        top_e = set(np.argsort(exact[b])[:10].tolist())
        overlap = len(top_a & top_e)
        min_overlap = 6 if n_bits >= 4 else 4
        assert overlap >= min_overlap, (n_bits, b, overlap)
