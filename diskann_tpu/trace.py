"""Span tracing: lightweight OTel-style spans exported to JSON.

The reference integrates the `tracing` crate with caller-location fields
(`diskann/src/tracing.rs:6-50`) and exports OpenTelemetry spans to JSON
from the disk benchmark (`diskann-benchmark/src/disk_index/
json_spancollector.rs`).  The TPU analogue: named spans around host-side
orchestration (build batches, search dispatches, staging IO) collected
in-process and dumped as one JSON document.  Device-side timing comes from
the bench harness (a span brackets a whole dispatch+sync).

Usage:
    from diskann_tpu.trace import span, export_spans, clear_spans
    with span("build.batch", batch=3, points=8192):
        ...
    export_spans("trace.json")
"""

from __future__ import annotations

import contextlib
import json
import threading
import time

_state = threading.local()
_all_spans: list[dict] = []
_lock = threading.Lock()
_next_id = 1   # ids allocated at span START (spans append at exit)
_enabled = False   # opt-in: enable() / the bench CLI --trace flag


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def _stack():
    if not hasattr(_state, "stack"):
        _state.stack = []
    return _state.stack


@contextlib.contextmanager
def span(name: str, **attributes):
    """Record a named span; nests under any active span on this thread."""
    if not _enabled:
        yield
        return
    global _next_id
    stk = _stack()
    parent = stk[-1]["id"] if stk else None
    with _lock:
        sid = _next_id
        _next_id += 1
    rec = {
        "id": sid,
        "name": name,
        "parent": parent,
        "start_ns": time.time_ns(),
        "attributes": {k: v for k, v in attributes.items()},
    }
    stk.append(rec)
    try:
        yield rec
    finally:
        rec["end_ns"] = time.time_ns()
        rec["duration_ms"] = round((rec["end_ns"] - rec["start_ns"]) / 1e6, 4)
        stk.pop()
        with _lock:
            _all_spans.append(rec)


def add_event(name: str, **attributes) -> None:
    """Zero-duration event attached to the active span (or top level)."""
    if not _enabled:
        return
    stk = _stack()
    rec = {
        "id": None,
        "name": name,
        "parent": stk[-1]["id"] if stk else None,
        "start_ns": time.time_ns(),
        "end_ns": time.time_ns(),
        "duration_ms": 0.0,
        "attributes": attributes,
    }
    with _lock:
        _all_spans.append(rec)


def spans() -> list[dict]:
    with _lock:
        return list(_all_spans)


def clear_spans() -> None:
    with _lock:
        _all_spans.clear()


def export_spans(path: str) -> int:
    """Write collected spans as JSON (json_spancollector.rs analogue).
    Returns the span count."""
    with _lock:
        data = list(_all_spans)
    with open(path, "w") as f:
        json.dump({"spans": data}, f, indent=1)
    return len(data)
