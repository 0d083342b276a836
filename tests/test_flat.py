import numpy as np
import pytest

from diskann_tpu.flat import FlatIndex
from diskann_tpu.ops.distance import Metric
from diskann_tpu.bench.recall import knn_recall_with_ties


@pytest.mark.parametrize("metric", [Metric.L2, Metric.InnerProduct, Metric.L1])
def test_flat_exact(rng, metric):
    x = rng.standard_normal((500, 32)).astype(np.float32)
    q = rng.standard_normal((20, 32)).astype(np.float32)
    idx = FlatIndex(x, metric)
    d, i = idx.search(q, k=10)

    if metric == Metric.L2:
        full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    elif metric == Metric.L1:
        full = np.abs(q[:, None, :] - x[None, :, :]).sum(-1)
    else:
        full = -(q @ x.T)
    gt_d = np.sort(full, axis=1)[:, :10]
    # distance-based comparison is robust to f32 reduction-order ties
    assert knn_recall_with_ties(d, gt_d, 10, rtol=1e-3, atol=1e-3) == 1.0
    np.testing.assert_allclose(d, gt_d, rtol=1e-3, atol=1e-3)


def test_flat_chunked_matches_unchunked(rng):
    x = rng.standard_normal((1000, 16)).astype(np.float32)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    idx = FlatIndex(x, Metric.L2)
    d1, i1 = idx.search(q, k=5, chunk=128)
    d2, i2 = idx.search(q, k=5, chunk=1000)
    np.testing.assert_allclose(d1, d2, rtol=1e-3, atol=1e-3)
    # id lists may swap tied entries; require near-total agreement
    overlap = np.mean([len(np.intersect1d(a, b)) for a, b in zip(i1, i2)])
    assert overlap >= 4.5


@pytest.mark.parametrize(
    "metric",
    [Metric.L2, Metric.InnerProduct, Metric.Cosine, Metric.CosineNormalized],
)
def test_flat_bf16_shortlist_matches_f32(rng, metric):
    """bf16 MXU shortlist + exact f32 rerank returns the f32 scan's top-k
    (the shortlist absorbs bf16's ~2% near-tie mis-rankings)."""
    x = rng.standard_normal((2000, 48)).astype(np.float32)
    q = rng.standard_normal((64, 48)).astype(np.float32)
    if metric == Metric.CosineNormalized:
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
    idx = FlatIndex(x, metric)
    d0, i0 = idx.search(q, k=10)
    d1, i1 = idx.search(q, k=10, compute="bf16")
    np.testing.assert_allclose(d1, d0, rtol=1e-3, atol=1e-3)
    overlap = np.mean([len(np.intersect1d(a, b)) for a, b in zip(i0, i1)])
    assert overlap >= 9.5


def test_flat_bf16_small_n_falls_back(rng):
    x = rng.standard_normal((7, 8)).astype(np.float32)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    d, i = FlatIndex(x, Metric.L2).search(q, k=10, compute="bf16")
    assert (i[:, 7:] == -1).all() and (i[:, :7] >= 0).all()


def test_flat_k_larger_than_n(rng):
    x = rng.standard_normal((7, 8)).astype(np.float32)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    d, i = FlatIndex(x, Metric.L2).search(q, k=10)
    assert (i[:, 7:] == -1).all()
    assert np.isinf(d[:, 7:]).all()
    assert (i[:, :7] >= 0).all()
