"""Interleaved A/B gate tests (contention-proof regression checking —
reference A/B CI + A/A noise-floor policy, disk-benchmarks-aa.md:7-60)."""

import numpy as np
import pytest

from diskann_tpu import GraphConfig, GraphIndex
from diskann_tpu.bench.abgate import (
    Side, decide, interleaved_search_gate, render_artifact,
)


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(7)
    n, d = 1500, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((32, d)).astype(np.float32)
    gt_d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(gt_d, axis=1)[:, :5]
    idx = GraphIndex.build(
        x, GraphConfig(max_degree=16, l_build=32), insert_batch_size=512,
        build_mode="packed", packed_dp=16,
    )
    return idx, q, gt


def test_side_parse():
    s = Side.parse("B", "l=40,mh=6,rl=12,mtrunc=1,rcomp=bf16,unroll=0")
    assert s.attrs == {"merge_trunc": True, "router_compute": "bf16",
                       "unroll_hops": False}
    assert s.search == {"l_search": 40, "max_hops": 6, "rerank_l": 12}


def test_interleaved_gate_clean_pass(small_index):
    """A == B (modulo merge_trunc, which is exact): interleaved reps all
    probe-clean -> PASS, per-side medians present, reps interleaved."""
    idx, q, gt = small_index
    a = Side.parse("A", "l=32,mtrunc=0")
    b = Side.parse("B", "l=32,mtrunc=1")
    res = interleaved_search_gate(
        idx, q, gt, 5, a, b, reps=2, max_attempts=4,
        clean_s=1e9, probe=lambda: 0.01,
    )
    for name in ("A", "B"):
        assert res[name]["clean_reps"] == 2
        assert res[name]["qps"] is not None
        assert res[name]["recall"] > 0.8
    verdict, lines = decide(res, None)
    # identical workload: recall identical, qps within CPU noise won't FAIL
    # deterministically — but recall must never fail and the verdict must be
    # automated (PASS or FAIL, never a waiver string)
    assert verdict in ("PASS", "FAIL")
    assert abs(res["A"]["recall"] - res["B"]["recall"]) < 0.05
    text = render_artifact("# hdr", res, None, verdict, lines)
    assert "raw interleaved reps" in text and verdict in text


def test_interleaved_gate_requeues_dirty_reps(small_index):
    """Probes over the clean threshold mark reps dirty and trigger
    re-queueing; with a probe that never clears, the gate is INDECISIVE —
    not FAIL, and never a silent pass."""
    idx, q, gt = small_index
    a = Side.parse("A", "l=32")
    b = Side.parse("B", "l=32")
    # probe: dirty for the first 2 calls per side, then clean
    calls = {"n": 0}

    def flaky_probe():
        calls["n"] += 1
        return 9.9 if calls["n"] <= 4 else 0.01

    res = interleaved_search_gate(
        idx, q, gt, 5, a, b, reps=1, max_attempts=6,
        clean_s=1.0, probe=flaky_probe,
    )
    assert res["A"]["clean_reps"] >= 1 and res["B"]["clean_reps"] >= 1
    assert any(not r["clean"] for r in res["A"]["reps"])  # dirty rep kept

    res2 = interleaved_search_gate(
        idx, q, gt, 5, a, b, reps=1, max_attempts=2,
        clean_s=1.0, probe=lambda: 9.9,
    )
    assert res2["A"]["qps"] is None
    verdict, lines = decide(res2, None)
    assert verdict == "INDECISIVE"


def test_decide_fail_on_regression():
    search_res = {
        "A": {"recall": 0.99, "qps": 1000.0, "reps": [], "clean_reps": 3},
        "B": {"recall": 0.99, "qps": 700.0, "reps": [], "clean_reps": 3},
    }
    verdict, lines = decide(search_res, None)
    assert verdict == "FAIL"
    assert any("qps" in m for m in lines)
    # improvements always pass (directional semantics)
    search_res["B"]["qps"] = 1500.0
    verdict, _ = decide(search_res, None)
    assert verdict == "PASS"


def test_decide_build_metric():
    build_res = {
        "A": {"reps": [], "clean_reps": 2, "points_per_s": 5000.0},
        "B": {"reps": [], "clean_reps": 2, "points_per_s": 4800.0},
    }
    verdict, _ = decide(None, build_res)
    assert verdict == "PASS"  # -4% within 10% tol
    build_res["B"]["points_per_s"] = 4000.0
    verdict, _ = decide(None, build_res)
    assert verdict == "FAIL"
    build_res["B"]["points_per_s"] = None
    verdict, lines = decide(None, build_res)
    assert verdict == "INDECISIVE"
