"""RobustPrune tests against the scalar occlude_list oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from diskann_tpu.graph.config import GraphConfig
from diskann_tpu.graph.prune import robust_prune
from diskann_tpu.ops.distance import Metric

from reference_impl import occlude_list, dist


def run_prune(point, pool_ids, vectors, config, self_id, degree=None):
    pool_ids = np.asarray(pool_ids, np.int32)
    pool_d = np.array(
        [
            dist(point, vectors[i], "l2" if config.metric == Metric.L2 else "ip")
            if i >= 0
            else np.inf
            for i in pool_ids
        ],
        np.float32,
    )
    cand_vecs = vectors[np.clip(pool_ids, 0, len(vectors) - 1)]
    res = robust_prune(
        jnp.asarray(point[None]),
        jnp.asarray(pool_ids[None]),
        jnp.asarray(pool_d[None]),
        jnp.asarray(cand_vecs[None]),
        jnp.asarray([self_id], jnp.int32),
        config,
        degree=degree,
    )
    n = int(res.count[0])
    return [int(i) for i in res.ids[0][:n]]


@pytest.mark.parametrize("alpha", [1.0, 1.2, 1.5])
def test_matches_oracle_l2(rng, alpha):
    n, d = 64, 6
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = GraphConfig(max_degree=8, alpha=alpha, metric=Metric.L2)
    for trial in range(5):
        point = rng.standard_normal(d).astype(np.float32)
        pool = rng.choice(n, size=24, replace=False)
        pool_d = [dist(point, vectors[i]) for i in pool]
        want = occlude_list(
            point, list(pool), pool_d, vectors, degree=8, alpha=alpha
        )
        got = run_prune(point, pool, vectors, config, self_id=-5)
        assert got == want, (trial, got, want)


def test_self_and_duplicates_excluded(rng):
    n, d = 32, 4
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = GraphConfig(max_degree=4, alpha=1.2)
    point = vectors[7]
    pool = [7, 3, 3, 5, -1, 9, 5, 11]
    got = run_prune(point, pool, vectors, config, self_id=7)
    assert 7 not in got
    assert -1 not in got
    assert len(got) == len(set(got))


def test_collinear_occlusion():
    # p at origin; a at x=1; b at x=2 (behind a). d(p,b)=4, d(a,b)=1 ->
    # ratio 4 > alpha so b is occluded by a for any alpha <= 4.
    vectors = np.array([[0.0], [1.0], [2.0], [-3.0]], np.float32)
    config = GraphConfig(max_degree=4, alpha=1.2)
    point = vectors[0]
    got = run_prune(point, [1, 2, 3], vectors, config, self_id=0)
    assert got == [1, 3]


def test_degree_cap(rng):
    n, d = 40, 8
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = GraphConfig(max_degree=4, alpha=1.0)
    point = rng.standard_normal(d).astype(np.float32)
    got = run_prune(point, list(range(30)), vectors, config, self_id=-1)
    assert len(got) <= 4


def test_matches_oracle_ip(rng):
    n, d = 48, 6
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = GraphConfig(max_degree=6, alpha=1.2, metric=Metric.InnerProduct)
    point = rng.standard_normal(d).astype(np.float32)
    pool = rng.choice(n, size=20, replace=False)
    pool_d = [dist(point, vectors[i], "ip") for i in pool]
    want = occlude_list(
        point, list(pool), pool_d, vectors, degree=6, alpha=1.2, metric="ip"
    )
    got = run_prune(point, pool, vectors, config, self_id=-1)
    assert got == want


def test_saturation_fills_to_degree(rng):
    n, d = 40, 4
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    config = GraphConfig(max_degree=10, alpha=1.2, saturate_after_prune=True)
    point = rng.standard_normal(d).astype(np.float32)
    got = run_prune(point, list(range(20)), vectors, config, self_id=-1)
    assert len(got) == 10
    assert len(set(got)) == 10
