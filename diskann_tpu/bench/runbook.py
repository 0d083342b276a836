"""Streaming runbook executor (BigANN format).

Reference: `diskann-benchmark-core/src/streaming/executors/bigann/runbook.rs:23-60`
— a YAML file describes a churn workload as numbered steps over a dataset:
``insert`` / ``delete`` ranges, ``replace``, ``search`` checkpoints (and our
``consolidate``).  The executor drives a `GraphIndex` through the steps and
reports recall at every search checkpoint against exact groundtruth over the
currently-live points (computed with the flat index on device)."""

from __future__ import annotations

import time

import numpy as np

from diskann_tpu.bench.recall import knn_recall
from diskann_tpu.flat.index import FlatIndex
from diskann_tpu.graph.index import GraphIndex


def parse_runbook(text_or_obj):
    """Accepts a YAML string, a list of step dicts, or a BigANN-style
    numbered mapping {1: {...}, 2: {...}}."""
    obj = text_or_obj
    if isinstance(obj, str):
        import yaml

        obj = yaml.safe_load(obj)
    if isinstance(obj, dict):
        if "steps" in obj:
            steps = obj["steps"]
        else:
            keyed = {int(k): v for k, v in obj.items() if str(k).isdigit()}
            steps = [keyed[k] for k in sorted(keyed)]
    else:
        steps = list(obj)
    return steps


class RunbookExecutor:
    """Drives an index through a streaming churn workload."""

    def __init__(
        self,
        index: GraphIndex,
        data: np.ndarray,
        queries: np.ndarray,
        *,
        k: int = 10,
        l_search: int | None = None,
    ):
        self.index = index
        self.data = np.asarray(data, np.float32)
        self.queries = np.asarray(queries, np.float32)
        self.k = k
        self.l_search = l_search
        # dataset row -> internal id (insert order defines the mapping)
        self.row_to_id: dict[int, int] = {}
        self.live_rows: set[int] = set()
        self.log: list[dict] = []

    def _ids_for_rows(self, rows):
        return np.array([self.row_to_id[r] for r in rows], np.int64)

    def run(self, steps) -> list[dict]:
        steps = parse_runbook(steps)
        for i, step in enumerate(steps):
            op = step["operation"]
            t0 = time.time()
            entry = {"step": i, "operation": op}
            if op == "insert":
                rows = range(int(step["start"]), int(step["end"]))
                ids = self.index.insert(self.data[list(rows)])
                for r, iid in zip(rows, ids):
                    self.row_to_id[r] = int(iid)
                    self.live_rows.add(r)
                entry["count"] = len(ids)
            elif op == "delete":
                rows = [
                    r for r in range(int(step["start"]), int(step["end"]))
                    if r in self.live_rows
                ]
                self.index.delete(self._ids_for_rows(rows))
                for r in rows:
                    self.live_rows.discard(r)
                entry["count"] = len(rows)
            elif op == "replace":
                # BigANN replace: overwrite rows [ids_start, ids_end) with
                # data rows [tags_start, tags_end): delete + insert
                old = [
                    r for r in range(int(step["ids_start"]), int(step["ids_end"]))
                    if r in self.live_rows
                ]
                self.index.delete(self._ids_for_rows(old))
                for r in old:
                    self.live_rows.discard(r)
                rows = range(int(step["tags_start"]), int(step["tags_end"]))
                ids = self.index.insert(self.data[list(rows)])
                for r, iid in zip(rows, ids):
                    self.row_to_id[r] = int(iid)
                    self.live_rows.add(r)
                entry["count"] = len(old) + len(ids)
            elif op == "consolidate":
                self.index.consolidate()
            elif op == "search":
                entry["recall"] = self._checkpoint_recall()
            else:
                raise ValueError(f"unknown runbook operation {op!r}")
            entry["wall_s"] = round(time.time() - t0, 4)
            self.log.append(entry)
        return self.log

    def _checkpoint_recall(self) -> float:
        live = sorted(self.live_rows)
        if not live:
            return 0.0
        live_arr = np.array(live)
        flat = FlatIndex(self.data[live_arr], self.index.metric)
        k = min(self.k, len(live))
        _, gt_local = flat.search(self.queries, k=k)
        # map local flat ids -> dataset rows -> internal ids
        gt_ids = np.where(
            gt_local >= 0,
            np.array([self.row_to_id[r] for r in live_arr])[
                np.clip(gt_local, 0, len(live) - 1)
            ],
            -1,
        )
        l = self.l_search or max(self.index.config.l_build, 2 * k)
        _, ids, _ = self.index.search(self.queries, k=k, l_search=l)
        return knn_recall(ids, gt_ids, k)
