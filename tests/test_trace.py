"""Span tracing subsystem (the reference's tracing + json_spancollector
analogue, `diskann/src/tracing.rs`, `json_spancollector.rs`)."""

import json

import numpy as np

from diskann_tpu import trace


def test_spans_nest_and_export(tmp_path):
    trace.clear_spans()
    trace.enable(True)
    try:
        with trace.span("outer", job="x"):
            with trace.span("inner", step=1):
                trace.add_event("checkpoint", mark=True)
    finally:
        trace.enable(False)
    sp = trace.spans()
    names = [s["name"] for s in sp]
    assert set(names) == {"outer", "inner", "checkpoint"}
    inner = next(s for s in sp if s["name"] == "inner")
    outer = next(s for s in sp if s["name"] == "outer")
    assert inner["parent"] == outer["id"]
    assert outer["duration_ms"] >= inner["duration_ms"]
    out = str(tmp_path / "t.json")
    n = trace.export_spans(out)
    assert n == 3
    assert len(json.load(open(out))["spans"]) == 3
    trace.clear_spans()


def test_insert_emits_spans(rng):
    from diskann_tpu import GraphConfig, GraphIndex

    trace.clear_spans()
    trace.enable(True)
    try:
        x = rng.standard_normal((600, 16)).astype(np.float32)
        GraphIndex.build(x, GraphConfig(max_degree=8, l_build=16),
                         insert_batch_size=256)
    finally:
        trace.enable(False)
    names = [s["name"] for s in trace.spans()]
    assert names.count("insert.batch") >= 2
    trace.clear_spans()
