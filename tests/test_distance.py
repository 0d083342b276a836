"""Oracle tests for the distance layer vs straightforward numpy.

Mirrors the reference's pattern of testing SIMD kernels against the scalar
`Emulated` backend (`diskann-wide/src/arch/emulated/mod.rs`)."""

import numpy as np
import pytest

from diskann_tpu.ops.distance import (
    Metric,
    distance_to_set,
    pairwise_distance,
    squared_norms,
)


def np_dist(q, x, metric):
    if metric == Metric.L2:
        return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    if metric == Metric.L1:
        return np.abs(q[:, None, :] - x[None, :, :]).sum(-1)
    dots = q @ x.T
    if metric == Metric.InnerProduct:
        return -dots
    qn = np.linalg.norm(q, axis=1)[:, None]
    xn = np.linalg.norm(x, axis=1)[None, :]
    cos = dots / (qn * xn)
    if metric == Metric.Cosine:
        return 1.0 - cos
    if metric == Metric.CosineNormalized:
        return 1.0 - dots
    raise ValueError


@pytest.mark.parametrize("metric", list(Metric))
def test_pairwise_matches_numpy(rng, metric):
    q = rng.standard_normal((17, 24)).astype(np.float32)
    x = rng.standard_normal((33, 24)).astype(np.float32)
    if metric == Metric.CosineNormalized:
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
    got = np.asarray(pairwise_distance(q, x, metric))
    want = np_dist(q, x, metric)
    # The |x|^2+|y|^2-2xy matmul form reorders the f32 reduction; the
    # reference tolerates the same class of error across SIMD widths.
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_distance_to_set_batched_candidates(rng):
    q = rng.standard_normal((5, 16)).astype(np.float32)
    x = rng.standard_normal((5, 7, 16)).astype(np.float32)
    got = np.asarray(distance_to_set(q, x, Metric.L2))
    for b in range(5):
        want = ((q[b][None] - x[b]) ** 2).sum(-1)
        np.testing.assert_allclose(got[b], want, rtol=2e-4, atol=2e-4)


def test_squared_norms(rng):
    x = rng.standard_normal((9, 33)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(squared_norms(x)), (x**2).sum(-1), rtol=1e-5
    )


def test_l2_nonnegative_with_identical_vectors(rng):
    x = rng.standard_normal((4, 8)).astype(np.float32)
    d = np.asarray(pairwise_distance(x, x, Metric.L2))
    assert (np.diag(d) == 0).all() or (np.diag(d) >= 0).all()
    assert (d >= 0).all()
