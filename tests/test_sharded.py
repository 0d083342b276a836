"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from diskann_tpu import FlatIndex, GraphConfig, Metric
from diskann_tpu.bench.recall import knn_recall
from diskann_tpu.parallel import ShardedGraphIndex, sharded_flat_search


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices())
    return Mesh(devs, axis_names=("shard",))


def test_sharded_flat_matches_single(rng, mesh):
    x = rng.standard_normal((1000, 16)).astype(np.float32)
    q = rng.standard_normal((16, 16)).astype(np.float32)
    d, i = sharded_flat_search(mesh, jnp.asarray(x), jnp.asarray(q), k=10)
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    assert knn_recall(np.asarray(i), gt_i, 10) >= 0.99
    np.testing.assert_allclose(np.asarray(d), gt_d, rtol=1e-3, atol=1e-3)


def test_sharded_graph_build_and_search(rng, mesh):
    n, d = 1600, 16
    centers = rng.standard_normal((30, d)).astype(np.float32)
    a = rng.integers(0, 30, size=n)
    x = centers[a] + 0.1 * rng.standard_normal((n, d)).astype(np.float32)
    qa = rng.integers(0, 30, size=50)
    q = centers[qa] + 0.1 * rng.standard_normal((50, d)).astype(np.float32)

    cfg = GraphConfig(max_degree=16, l_build=32)
    idx = ShardedGraphIndex(mesh, d, cfg, cap_per_shard=512)
    assign = np.arange(n) % idx.n_shards
    for off in range(0, n, 800):
        idx.insert(x[off : off + 800], assign[off : off + 800])

    dists, gids, cmps = idx.search(q, k=10, l_search=40)
    # map global ids back to original rows: shard s, local j -> row index
    per = [np.nonzero(assign == s)[0] for s in range(idx.n_shards)]
    back = {}
    for s, rows in enumerate(per):
        for j, row in enumerate(rows):
            back[s * idx.cap_per_shard + j] = row
    mapped = np.array(
        [[back.get(int(g), -1) for g in row] for row in gids], np.int64
    )
    gt_d, gt_i = FlatIndex(x, Metric.L2).search(q, k=10)
    r = knn_recall(mapped, gt_i, 10)
    assert r >= 0.9, r
