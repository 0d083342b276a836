"""Vector-set service facade.

Replaces the surface the reference exports to the Garnet server over C FFI
(`diskann-garnet/src/lib.rs:222-835`: create_index / drop_index / insert /
remove / search_vector / search_element / continue_search / set_attribute /
build_quant_table / backfill_quant_vectors / card, serving the Redis
`VADD`/`VSIM` vector-set commands).  Here the host is Python, so the
surface is a small in-process registry of named dynamic indexes with
element-name <-> internal-id mapping and per-element attributes — the same
contract a serving layer would bind to.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from diskann_tpu.graph.config import GraphConfig
from diskann_tpu.graph.index import GraphIndex
from diskann_tpu.ops.distance import Metric


class VectorSet:
    """One named collection (the `VADD`/`VSIM` target)."""

    def __init__(self, dim: int, config: GraphConfig | None = None, **kw):
        # small insert granularity: a single VADD pads to one minibatch, so
        # the padding waste is bounded by this, not the bulk-build 1024
        kw.setdefault("insert_batch_size", 64)
        self.index = GraphIndex(dim, config, **kw)
        self.name_to_id: dict[str, int] = {}
        self.id_to_name: dict[int, str] = {}
        self.attributes: dict[str, Any] = {}
        self.quant_mode: str | None = None
        self._cursors: dict[int, Any] = {}
        self._next_cursor = 0
        # write buffer: single VADDs accumulate host-side and commit as one
        # minibatch at the next read (or when a minibatch fills) — a lone
        # add would otherwise pay a full padded insert_batch dispatch
        self._pending: list[tuple[str, np.ndarray, Any]] = []
        # ids whose labels changed since the last filtered search; applied
        # incrementally via LabelSet.set_labels instead of a full O(capacity)
        # rebuild (None = label set never built yet)
        self._label_dirty_ids: set[int] | None = None

    # VADD
    def add(self, name: str, vector, attribute: Any = None) -> bool:
        if name in self.name_to_id or any(
            n == name for n, _, _ in self._pending
        ):
            return False  # reference semantics: element ids are unique
        self._pending.append(
            (name, np.asarray(vector, np.float32), attribute)
        )
        if len(self._pending) >= self.index.insert_batch_size:
            self._flush()
        return True

    def _flush(self) -> None:
        """Commit buffered VADDs as one insert minibatch."""
        if not self._pending:
            return
        pend, self._pending = self._pending, []
        vecs = np.stack([v for _, v, _ in pend])
        ids = self.index.insert(vecs)
        for (name, _, attr), iid in zip(pend, ids):
            self.name_to_id[name] = int(iid)
            self.id_to_name[int(iid)] = name
            if attr is not None:
                self.attributes[name] = attr
            self._mark_label_dirty(int(iid))
        if self.quant_mode is not None:
            self._encode_rows(np.asarray(ids))

    def _mark_label_dirty(self, iid: int) -> None:
        if self._label_dirty_ids is not None:
            self._label_dirty_ids.add(iid)

    def add_batch(self, names, vectors, attributes=None) -> int:
        """Batched VADD — the streaming-server fast path (one device
        dispatch per minibatch instead of one per element)."""
        vectors = np.asarray(vectors, np.float32)
        fresh = [i for i, n in enumerate(names) if n not in self.name_to_id]
        if not fresh:
            return 0
        ids = self.index.insert(vectors[fresh])
        for j, i in enumerate(fresh):
            name = names[i]
            self.name_to_id[name] = int(ids[j])
            self.id_to_name[int(ids[j])] = name
            if attributes is not None and attributes[i] is not None:
                self.attributes[name] = attributes[i]
            self._mark_label_dirty(int(ids[j]))
        if self.quant_mode is not None:
            self._encode_rows(np.asarray(ids))
        return len(fresh)

    # VREM
    def remove(self, name: str) -> bool:
        for j, (n, _, _) in enumerate(self._pending):
            if n == name:           # buffered, never committed: drop it
                self._pending.pop(j)
                return True
        iid = self.name_to_id.pop(name, None)
        if iid is None:
            return False
        self.id_to_name.pop(iid, None)
        self.attributes.pop(name, None)
        self.index.delete([iid])
        self._mark_label_dirty(iid)
        return True

    # ------------------------------------------------------- dynamic quant
    def build_quant_table(self, kind: str = "spherical", **kw) -> None:
        """Train a quantizer over the CURRENT elements (reference
        `build_quant_table`, `diskann-garnet/src/quantization.rs`): after
        this, `backfill_quant_vectors` encodes existing rows and subsequent
        adds are encoded incrementally, so searches can run quantized."""
        self._flush()
        if kind == "spherical":
            self.index.attach_spherical(**kw)
        elif kind == "sq":
            self.index.attach_sq(**kw)
        elif kind == "minmax":
            self.index.attach_minmax(**kw)
        else:
            raise ValueError(f"unsupported quant kind {kind!r}")
        self.quant_mode = kind

    def backfill_quant_vectors(self) -> int:
        """Re-encode every current element with the trained quantizer
        (reference `backfill_quant_vectors`).  attach_* already encodes all
        rows present at training time; this re-encodes to cover rows added
        between training and backfill."""
        if self.quant_mode is None:
            raise ValueError("no quant table built")
        self._flush()
        ids = np.fromiter(self.id_to_name, np.int64, len(self.id_to_name))
        self._encode_rows(ids)
        return len(ids)

    def _encode_rows(self, ids: np.ndarray) -> None:
        """Incrementally encode rows `ids` into the attached quant arrays
        (the fixed trained transform applies per row, so streaming adds
        never retrain)."""
        import jax.numpy as jnp

        idx = self.index
        ids_j = jnp.asarray(ids.astype(np.int32))
        vecs = idx.state.vectors[ids_j]
        if self.quant_mode == "spherical":
            pc = idx.sph.pack(idx.sph.encode(vecs))
            idx.sph_words = idx.sph_words.at[ids_j].set(pc.words)
            idx.sph_norms = idx.sph_norms.at[ids_j].set(pc.norms)
            idx.sph_cscale = idx.sph_cscale.at[ids_j].set(pc.cscale)
        elif self.quant_mode == "sq":
            from diskann_tpu.graph.scorers import sq_aux_norms, sq_center_codes

            codes = idx.sq.encode(vecs)
            ci8, _ = sq_center_codes(codes, idx.sq.scale, idx.sq.bias)
            idx.sq_codes = idx.sq_codes.at[ids_j].set(ci8)
            idx.sq_aux = idx.sq_aux.at[ids_j].set(
                sq_aux_norms(ci8, idx.sq.scale)
            )
        elif self.quant_mode == "minmax":
            codes, lo, step = idx.mm.encode(vecs)
            ci8 = (codes.astype(jnp.int32) - 128).astype(jnp.int8)
            dec = idx.mm.decode(codes, lo, step)
            idx.mm_codes = idx.mm_codes.at[ids_j].set(ci8)
            idx.mm_lo = idx.mm_lo.at[ids_j].set(lo)
            idx.mm_step = idx.mm_step.at[ids_j].set(step)
            idx.mm_aux = idx.mm_aux.at[ids_j].set(jnp.sum(dec * dec, axis=1))

    # ------------------------------------------------------------- search
    def _search_mode(self, mode: str | None) -> str:
        if mode is not None:
            return mode
        # no quantizer -> mode="auto": the index routes small sets to the
        # exact MXU flat scan (measured faster than the walk below the N*d
        # crossover, BENCH_WIKI100K_r04.json) and large ones to the graph —
        # the caller never has to choose (VERDICT r4 item 7)
        return self.quant_mode or "auto"

    # VSIM with a query vector
    def search_vector(self, vector, k: int = 10, *,
                      l_search: int | None = None, mode: str | None = None):
        self._flush()
        d, ids, _ = self.index.search(
            np.asarray(vector, np.float32)[None], k=k, l_search=l_search,
            mode=self._search_mode(mode),
        )
        return [
            (self.id_to_name[int(i)], float(dd))
            for i, dd in zip(ids[0], d[0])
            if int(i) in self.id_to_name
        ]

    # VSIM ... FILTER (reference `filtered_search_vector`, lib.rs:623-667:
    # inline filtered search with AdaptiveL capped by max_filtering_effort)
    def search_vector_filtered(self, vector, predicate, k: int = 10, *,
                               l_search: int | None = None,
                               max_filtering_effort: int = 8):
        """Filtered VSIM: elements whose ATTRIBUTE is a label string (or a
        list of label strings) are matched against `predicate`
        ("a & !b" syntax); unlabeled elements never match.
        max_filtering_effort caps the AdaptiveL re-search scale."""
        self._flush()
        self._sync_labels()
        d, ids, _ = self.index.search_filtered(
            np.asarray(vector, np.float32)[None], predicate, k=k,
            l_search=l_search, max_l_scale=max_filtering_effort,
        )
        return [
            (self.id_to_name[int(i)], float(dd))
            for i, dd in zip(ids[0], d[0])
            if int(i) in self.id_to_name
        ]

    def _labels_of(self, iid: int) -> list[str]:
        a = self.attributes.get(self.id_to_name.get(iid, ""))
        if isinstance(a, str):
            return [a]
        if isinstance(a, (list, tuple)) and a and all(
            isinstance(s, str) for s in a
        ):
            return list(a)
        return []

    def _sync_labels(self) -> None:
        """Bring the index's LabelSet up to date.  First filtered search
        builds it in full; afterwards only ids touched by add/remove/
        set_attribute re-encode, via the incremental `LabelSet.set_labels`
        device scatter (O(dirty) instead of O(capacity))."""
        if self._label_dirty_ids is None:
            cap = self.index.state.capacity
            lists: list[list[str]] = [[] for _ in range(cap)]
            for name, iid in self.name_to_id.items():
                lists[iid] = self._labels_of(iid)
            self.index.attach_labels(lists)
            self._label_dirty_ids = set()
        elif self._label_dirty_ids:
            ids = np.fromiter(
                self._label_dirty_ids, np.int64, len(self._label_dirty_ids)
            )
            self.index.labels.set_labels(
                ids, [self._labels_of(int(i)) for i in ids]
            )
            self._label_dirty_ids.clear()

    # VSIM with an element name
    def search_element(self, name: str, k: int = 10, **kw):
        self._flush()
        iid = self.name_to_id[name]
        vec = np.asarray(self.index.state.vectors[iid])
        out = self.search_vector(vec, k + 1, **kw)
        return [(n, d) for n, d in out if n != name][:k]

    # paged search over the service contract (`lib.rs:752` continue_search)
    def start_search(self, vector, page_size: int = 10, *,
                     l_search: int | None = None) -> tuple[int, list]:
        """Begin a resumable search; returns (cursor, first page)."""
        self._flush()
        from diskann_tpu.graph.modes import PagedSearch

        pager = PagedSearch(
            self.index, np.asarray(vector, np.float32),
            l_search=l_search,
        )
        cursor = self._next_cursor
        self._next_cursor += 1
        self._cursors[cursor] = pager
        return cursor, self.continue_search(cursor, page_size)

    def continue_search(self, cursor: int, page_size: int = 10) -> list:
        """Next page of a search started with `start_search`; an empty page
        ends (and frees) the cursor — reference `continue_search`."""
        pager = self._cursors.get(cursor)
        if pager is None:
            return []
        d, ids = pager.next_page(page_size)
        out = [
            (self.id_to_name[int(i)], float(dd))
            for i, dd in zip(ids, d)
            if int(i) in self.id_to_name
        ]
        if len(ids) == 0:
            self._cursors.pop(cursor, None)
        return out

    def end_search(self, cursor: int) -> bool:
        return self._cursors.pop(cursor, None) is not None

    def set_attribute(self, name: str, attribute: Any) -> bool:
        for j, (n, v, _) in enumerate(self._pending):
            if n == name:
                self._pending[j] = (n, v, attribute)
                return True
        if name not in self.name_to_id:
            return False
        self.attributes[name] = attribute
        self._mark_label_dirty(self.name_to_id[name])
        return True

    def get_attribute(self, name: str) -> Any:
        for n, _, a in self._pending:
            if n == name:
                return a
        return self.attributes.get(name)

    # CARD
    def card(self) -> int:
        return len(self.name_to_id) + len(self._pending)


class VectorService:
    """Named-index registry (create_index / drop_index / ...)."""

    def __init__(self):
        self._sets: dict[str, VectorSet] = {}

    def create_index(
        self, name: str, dim: int, *, metric: str = "l2",
        max_degree: int = 32, l_build: int = 64, **kw,
    ) -> VectorSet:
        if name in self._sets:
            raise KeyError(f"index {name!r} exists")
        cfg = GraphConfig(
            max_degree=max_degree, l_build=l_build, metric=Metric(metric)
        )
        vs = VectorSet(dim, cfg, **kw)
        self._sets[name] = vs
        return vs

    def drop_index(self, name: str) -> bool:
        return self._sets.pop(name, None) is not None

    def get(self, name: str) -> VectorSet:
        return self._sets[name]

    def names(self) -> list[str]:
        return sorted(self._sets)
