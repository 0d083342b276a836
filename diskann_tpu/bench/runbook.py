"""Streaming runbook executor (BigANN format).

Reference: `diskann-benchmark-core/src/streaming/executors/bigann/runbook.rs:23-120`
— a YAML file maps a dataset name to a churn workload of numbered stages:
``insert`` / ``delete`` ranges over external ids (tags), ``replace`` (the
vectors tagged ``tags_start..tags_end`` are replaced with the dataset rows
``ids_start..ids_end``), and ``search`` checkpoints (plus our
``consolidate`` extension).  ``max_pts`` bounds the live set, so runbooks
like the shipped ``test_data/yfcc/yfcc_runbook.yaml`` force slot recycling.

The executor drives a `GraphIndex` through the stages, tracking the
tag -> dataset-row mapping (a replaced tag serves different data afterward),
and reports recall at every search checkpoint against exact groundtruth over
the currently-live points (computed with the flat index on device).
"""

from __future__ import annotations

import time
from typing import NamedTuple

import numpy as np

from diskann_tpu.bench.recall import knn_recall
from diskann_tpu.flat.index import FlatIndex
from diskann_tpu.graph.index import GraphIndex


class Runbook(NamedTuple):
    name: str | None
    max_pts: int | None
    steps: list[dict]


def parse_runbook(text_or_obj):
    """Accepts a YAML string, a list of step dicts, or a BigANN-style
    numbered mapping {1: {...}, 2: {...}}; returns the step list.
    Use `load_runbook` to also recover the dataset name and max_pts."""
    return load_runbook(text_or_obj).steps


def load_runbook(text_or_obj, dataset: str | None = None) -> Runbook:
    """Full BigANN runbook loader (`runbook.rs:33-120`): the top level maps
    dataset names to runbook definitions with `max_pts` + numbered stages
    (`gt_url` is parsed and ignored, as in the reference)."""
    obj = text_or_obj
    if isinstance(obj, str):
        import yaml

        obj = yaml.safe_load(obj)
    name = None
    max_pts = None
    if isinstance(obj, dict):
        numbered = {k: v for k, v in obj.items() if str(k).isdigit()}
        if not numbered and "steps" not in obj:
            # dataset-name -> runbook-definition nesting
            if dataset is None:
                if len(obj) != 1:
                    raise ValueError(
                        f"runbook holds {sorted(obj)}; pass dataset="
                    )
                dataset = next(iter(obj))
            name = dataset
            obj = obj[dataset]
            numbered = {k: v for k, v in obj.items() if str(k).isdigit()}
        max_pts = obj.get("max_pts") if isinstance(obj, dict) else None
        if "steps" in obj:
            steps = obj["steps"]
        else:
            keyed = {int(k): v for k, v in numbered.items()}
            steps = [keyed[k] for k in sorted(keyed)]
    else:
        steps = list(obj)
    return Runbook(name, max_pts, steps)


class RunbookExecutor:
    """Drives an index through a streaming churn workload.

    External ids (tags) follow the BigANN convention: an `insert` stage uses
    the dataset offsets ``start..end`` as both data rows and tags; a
    `replace` stage re-points existing tags ``tags_start..tags_end`` at the
    dataset rows ``ids_start..ids_end`` (`runbook.rs:96-110`)."""

    def __init__(
        self,
        index: GraphIndex,
        data: np.ndarray,
        queries: np.ndarray,
        *,
        k: int = 10,
        l_search: int | None = None,
        delete_method: str = "scan",
        delete_repair: str = "prune",
        delete_kwargs: dict | None = None,
        search_kwargs: dict | None = None,
        exact_checkpoints: bool = True,
    ):
        self.index = index
        self.data = np.asarray(data, np.float32)
        self.queries = np.asarray(queries, np.float32)
        self.k = k
        self.l_search = l_search
        self.delete_method = delete_method
        self.delete_repair = delete_repair
        self.delete_kwargs = dict(delete_kwargs or {})
        self.search_kwargs = dict(search_kwargs or {})
        self.exact_checkpoints = exact_checkpoints
        self.tag_to_id: dict[int, int] = {}   # live tag -> internal id
        self.tag_to_row: dict[int, int] = {}  # live tag -> dataset row served
        self.log: list[dict] = []

    @property
    def live_tags(self) -> set[int]:
        return set(self.tag_to_id)

    def _sync(self):
        """Block until the index's enqueued device work is DONE.  Dispatch
        is async and `block_until_ready` is a no-op on the axon backend
        (CLAUDE.md), so without fetching a slice each step's wall time only
        measures enqueue — the previous step's device work then drains
        inside the NEXT step's wall and per-op rates come out inverted
        (measured: 50k scan-deletes attributed 2s while the following
        insert absorbed their ~50s of repair work)."""
        np.asarray(self.index.state.valid[:1])

    def run(self, steps) -> list[dict]:
        steps = parse_runbook(steps)
        self._sync()  # don't bill pre-existing queue depth to step 0
        for i, step in enumerate(steps):
            op = step["operation"]
            t0 = time.time()
            entry = {"step": i, "operation": op}
            if op == "insert":
                tags = list(range(int(step["start"]), int(step["end"])))
                ids = self.index.insert(self.data[tags])
                for t, iid in zip(tags, ids):
                    self.tag_to_id[t] = int(iid)
                    self.tag_to_row[t] = t
                entry["count"] = len(ids)
            elif op == "delete":
                tags = [
                    t for t in range(int(step["start"]), int(step["end"]))
                    if t in self.tag_to_id
                ]
                if tags:
                    self.index.delete(
                        np.array([self.tag_to_id[t] for t in tags], np.int64),
                        method=self.delete_method,
                        repair=self.delete_repair,
                        **self.delete_kwargs,
                    )
                for t in tags:
                    del self.tag_to_id[t]
                    del self.tag_to_row[t]
                entry["count"] = len(tags)
            elif op == "replace":
                # tags [tags_start, tags_end) now serve dataset rows
                # [ids_start, ids_end): delete the old internal ids, insert
                # the new vectors, keep the tags (slots recycle via freelist)
                t0r, t1r = int(step["tags_start"]), int(step["tags_end"])
                r0, r1 = int(step["ids_start"]), int(step["ids_end"])
                assert t1r - t0r == r1 - r0, (step,)
                pairs = [
                    (t, r0 + (t - t0r))
                    for t in range(t0r, t1r)
                    if t in self.tag_to_id
                ]
                if pairs:
                    self.index.delete(
                        np.array(
                            [self.tag_to_id[t] for t, _ in pairs], np.int64
                        ),
                        method=self.delete_method,
                        repair=self.delete_repair,
                        **self.delete_kwargs,
                    )
                    rows = [r for _, r in pairs]
                    ids = self.index.insert(self.data[rows])
                    for (t, r), iid in zip(pairs, ids):
                        self.tag_to_id[t] = int(iid)
                        self.tag_to_row[t] = r
                entry["count"] = len(pairs)
            elif op == "consolidate":
                self.index.consolidate()
            elif op == "search":
                entry["recall"] = self._checkpoint_recall()
            else:
                raise ValueError(f"unknown runbook operation {op!r}")
            self._sync()
            entry["wall_s"] = round(time.time() - t0, 4)
            self.log.append(entry)
        return self.log

    def _checkpoint_recall(self) -> float:
        tags = sorted(self.tag_to_id)
        if not tags:
            return 0.0
        rows = np.array([self.tag_to_row[t] for t in tags])
        flat = FlatIndex(self.data[rows], self.index.metric)
        k = min(self.k, len(tags))
        _, gt_local = flat.search(self.queries, k=k)
        # map local flat positions -> internal ids
        internal = np.array([self.tag_to_id[t] for t in tags])
        gt_ids = np.where(
            gt_local >= 0,
            internal[np.clip(gt_local, 0, len(tags) - 1)],
            -1,
        )
        l = self.l_search or max(self.index.config.l_build, 2 * k)
        _, ids, _ = self.index.search(self.queries, k=k, l_search=l,
                                      **self.search_kwargs)
        return knn_recall(ids, gt_ids, k)
