"""Save/load round trips + benchmark registry + tolerance checker."""

import numpy as np
import pytest

from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
from diskann_tpu.bench.recall import knn_recall
from diskann_tpu.bench.registry import Registry, check_tolerances
from diskann_tpu.io_.record import load_record, save_record
from diskann_tpu.io_ import read_fbin, write_fbin


def test_record_roundtrip(tmp_path, rng):
    arrays = {
        "a": rng.standard_normal((5, 3)).astype(np.float32),
        "b": rng.integers(0, 100, size=(7,)).astype(np.int32),
    }
    save_record(str(tmp_path / "rec"), "test", {"x": 1}, arrays)
    manifest, loaded = load_record(str(tmp_path / "rec"))
    assert manifest["kind"] == "test"
    assert manifest["meta"] == {"x": 1}
    np.testing.assert_array_equal(loaded["a"], arrays["a"])
    np.testing.assert_array_equal(loaded["b"], arrays["b"])


def test_fbin_roundtrip(tmp_path, rng):
    x = rng.standard_normal((10, 4)).astype(np.float32)
    p = str(tmp_path / "x.fbin")
    write_fbin(p, x)
    np.testing.assert_array_equal(read_fbin(p), x)
    np.testing.assert_array_equal(np.asarray(read_fbin(p, mmap=True)), x)


def test_index_save_load(tmp_path, rng):
    x = rng.standard_normal((500, 12)).astype(np.float32)
    cfg = GraphConfig(max_degree=12, l_build=24)
    idx = GraphIndex.build(x, cfg, insert_batch_size=256)
    idx.delete([5, 6, 7])
    q = x[:20] + 0.01
    d1, i1, _ = idx.search(q, k=5, l_search=24)

    idx.save(str(tmp_path / "idx"))
    idx2 = GraphIndex.load(str(tmp_path / "idx"), insert_batch_size=256)
    assert idx2.n == idx.n
    assert idx2.config == idx.config
    d2, i2, _ = idx2.search(q, k=5, l_search=24)
    np.testing.assert_array_equal(i1, i2)
    # deleted stay deleted after reload
    assert not np.isin(i2, [5, 6, 7]).any()
    # and the freelist survives
    assert sorted(idx2.free_slots) == sorted(idx.free_slots)


def test_registry_and_tolerances():
    reg = Registry()
    reg.register("toy", lambda job: {"qps": 100.0 * job.get("x", 1), "recall": 0.99})
    res = reg.run_job({"benchmark": "toy", "x": 2})
    assert res["result"]["qps"] == 200.0

    a = {"qps": 100.0, "recall": 0.99}
    b = {"qps": 95.0, "recall": 0.99}
    pf = check_tolerances(a, b, {"qps": 0.10, "recall": 0.01})
    assert pf.passed
    pf2 = check_tolerances(a, {"qps": 80.0, "recall": 0.99}, {"qps": 0.10})
    assert not pf2.passed
    assert "qps" in pf2.failures[0]


def test_small_benchmark_job():
    from diskann_tpu.bench.harness import default_registry

    reg = default_registry()
    res = reg.run_job({
        "benchmark": "graph-index",
        "n": 1200, "dim": 16, "n_queries": 50,
        "max_degree": 16, "l_build": 32, "search_l": [32],
        "device_data": False, "insert_batch_size": 512,
    })
    sweep = res["result"]["search"][0]
    assert sweep["recall"] >= 0.9
    assert sweep["qps"] > 0


def test_check_tolerances_directional():
    """Reference semantics (`disk_index/benchmarks.rs:239-276`): for
    higher-is-better metrics only a drop fails; improvements always pass."""
    a = {"qps": 100.0, "lat": 10.0}
    hib = {"qps": {"tol": 0.10, "direction": "higher_is_better"}}
    lib = {"lat": {"tol": 0.15, "direction": "lower_is_better"}}
    # big improvement passes (symmetric check would fail it)
    assert check_tolerances(a, {"qps": 200.0}, hib).passed
    # drop within tolerance passes
    assert check_tolerances(a, {"qps": 91.0}, hib).passed
    # drop beyond tolerance fails
    assert not check_tolerances(a, {"qps": 85.0}, hib).passed
    # latency: drop (improvement) passes, rise beyond tol fails
    assert check_tolerances(a, {"lat": 2.0}, lib).passed
    assert not check_tolerances(a, {"lat": 12.0}, lib).passed


def test_check_tolerances_headline_gate():
    """The shipped headline tolerance file gates BENCH_r{N}.json artifacts."""
    import json
    import os

    tol_path = os.path.join(
        os.path.dirname(__file__), "..", "diskann_tpu", "bench", "example",
        "headline-tolerances.json",
    )
    with open(tol_path) as f:
        tol = json.load(f)
    r1 = {"value": 14478.0, "extra": {"recall": 0.951,
                                      "build_points_per_s": 2969}}
    r2 = {"value": 52466.0, "extra": {"recall": 0.9536,
                                      "build_points_per_s": 3701}}
    assert check_tolerances(r1, r2, tol).passed      # r2 improved on r1
    assert not check_tolerances(r2, r1, tol).passed  # reverse = regression
