"""Streaming runbook executor: churn workload with stable recall."""

import numpy as np
import pytest

from diskann_tpu import GraphConfig, GraphIndex
from diskann_tpu.bench.runbook import RunbookExecutor, parse_runbook


def test_parse_formats():
    steps = parse_runbook([{"operation": "insert", "start": 0, "end": 10}])
    assert steps[0]["operation"] == "insert"
    steps = parse_runbook({
        "2": {"operation": "search"},
        "1": {"operation": "insert", "start": 0, "end": 5},
    })
    assert [s["operation"] for s in steps] == ["insert", "search"]
    yaml_text = """
steps:
  - {operation: insert, start: 0, end: 100}
  - {operation: search}
"""
    steps = parse_runbook(yaml_text)
    assert len(steps) == 2


def test_churn_workload_stable_recall(rng):
    n, d = 1600, 16
    centers = rng.standard_normal((20, d)).astype(np.float32) * 2
    a = rng.integers(0, 20, size=n)
    data = centers[a] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
    queries = centers[rng.integers(0, 20, size=40)] + 0.15 * rng.standard_normal(
        (40, d)
    ).astype(np.float32)

    idx = GraphIndex(d, GraphConfig(max_degree=16, l_build=32),
                     capacity=1024, insert_batch_size=256)
    ex = RunbookExecutor(idx, data, queries, k=10, l_search=48)
    log = ex.run([
        {"operation": "insert", "start": 0, "end": 800},
        {"operation": "search"},
        {"operation": "delete", "start": 0, "end": 300},
        {"operation": "search"},
        {"operation": "insert", "start": 800, "end": 1300},
        {"operation": "search"},
        # tags 300..500 (live) re-point at dataset rows 1300..1500
        {"operation": "replace", "tags_start": 300, "tags_end": 500,
         "ids_start": 1300, "ids_end": 1500},
        {"operation": "consolidate"},
        {"operation": "search"},
    ])
    recalls = [e["recall"] for e in log if e["operation"] == "search"]
    assert len(recalls) == 4
    # recall stays stable through 50%+ churn (the Fresh/IP-DiskANN promise)
    assert min(recalls) >= 0.85, recalls
    # freelist got used by the replace (slots recycled)
    assert idx.n <= 1800